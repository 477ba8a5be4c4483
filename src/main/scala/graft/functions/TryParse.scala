package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exception-free `try_cast(string AS <integral>)` (r16).
  *
  * Spark's TRY-mode `Cast` evaluates the ANSI cast and catches: for a
  * string→integral cast the ANSI path is `UTF8String.toIntExact`-family,
  * which calls the non-throwing wrapper parser and THROWS a formatted
  * SparkNumberFormatException (error-class machinery + stack trace) on
  * failure, only for TRY's wrapper to swallow it — measured ~7 µs per
  * FAILING row, 10× the cost of the parse itself (BenchOne: a 150k-row
  * always-failing try_cast column cost 1.0 s of a 1.5 s query). On dirty
  * data at scale — exactly where try_cast is the right tool — the
  * exception tax dominates.
  *
  * This expression calls the SAME wrapper parsers the ANSI cast wraps
  * (`UTF8String.toInt/toLong/toShort/toByte(wrapper)`) and returns
  * null on parse failure directly — semantics identical to TRY-mode
  * Cast BY CONSTRUCTION (same parser, same accept set, no throw), and
  * re-proven value-for-value over an adversarial input battery in
  * PlanAuditSpec. Null input → null like any UnaryExpression.
  * [[graft.plans.TryCastNoThrowRule]] rewrites eligible TRY casts to
  * this form; it is not SQL-registered on its own. */
case class TryParseIntegral(child: Expression, override val dataType: DataType)
    extends UnaryExpression with ExpectsInputTypes {
  require(TryParseIntegral.supported(dataType),
    s"TryParseIntegral supports byte/short/int/long, got $dataType")
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_try_parse_integral"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    dataType match {
      case IntegerType =>
        val w = new UTF8String.IntWrapper
        if (s.toInt(w)) w.value else null
      case LongType =>
        val w = new UTF8String.LongWrapper
        if (s.toLong(w)) w.value else null
      case ShortType =>
        val w = new UTF8String.IntWrapper
        if (s.toShort(w)) w.value.toShort else null
      case ByteType =>
        val w = new UTF8String.IntWrapper
        if (s.toByte(w)) w.value.toByte else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (wrapperCls, parse, castTo) = dataType match {
      case IntegerType =>
        ("org.apache.spark.unsafe.types.UTF8String.IntWrapper", "toInt", "")
      case LongType =>
        ("org.apache.spark.unsafe.types.UTF8String.LongWrapper", "toLong", "")
      case ShortType =>
        ("org.apache.spark.unsafe.types.UTF8String.IntWrapper", "toShort", "(short) ")
      case ByteType =>
        ("org.apache.spark.unsafe.types.UTF8String.IntWrapper", "toByte", "(byte) ")
    }
    val wrapper = ctx.addMutableState(wrapperCls, "tryParseWrapper",
      v => s"$v = new $wrapperCls();")
    val childGen = child.genCode(ctx)
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = ${org.apache.spark.sql.catalyst.expressions.codegen
        .CodeGenerator.defaultValue(dataType)};
      if (!${childGen.isNull} && ${childGen.value}.$parse($wrapper)) {
        ${ev.isNull} = false;
        ${ev.value} = $castTo$wrapper.value;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): TryParseIntegral =
    copy(child = newChild)
}

object TryParseIntegral {
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}
