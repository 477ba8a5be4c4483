package graft.plans

import graft.functions.{MinHashBands, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point — makes graft's native expressions
  * callable from SQL strings on sessions built with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession sets
  * it). DataFrame-API callers don't need this: [[graft.operators.TextDedup]]
  * wraps the expressions into Columns directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, k, b) => MinHashBands(sh, intLit(k, "k"), intLit(b, "bands"))
        case _ => throw new IllegalArgumentException(
          "usage: graft_minhash_bands(shingles, k, bands)")
      }))

    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(sh) => SimHash64(sh)
        case _ => throw new IllegalArgumentException("usage: graft_simhash64(shingles)")
      }))
  }
}
