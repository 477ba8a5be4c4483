package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two `array<string>` columns in one pass:
  * hash-set build + probe, |∩| / |∪| over DISTINCT elements — the same
  * value as `size(array_intersect(a,b))/size(array_union(a,b))` (both
  * built-ins dedup), without allocating the two intermediate arrays per
  * row, which dominates on millions of candidate pairs. The
  * [[graft.plans.GraftExtensions]] optimizer rule rewrites the composed
  * form into this expression.
  */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_jaccard"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      val s = b.getUTF8String(j)
      if (setB.add(s) && setA.contains(s)) inter += 1
      j += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}
