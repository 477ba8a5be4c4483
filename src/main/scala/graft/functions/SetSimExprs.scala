package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Jaccard similarity of two duplicate-free `array<string>` columns
  * in one pass: hash-set of the smaller side, probe with the larger,
  * |∩| / (|a|+|b|-|∩|). The composed
  * `size(array_intersect)/size(array_union)` form allocates two
  * intermediate arrays per row — on millions of candidate pairs the
  * allocation dominates; this runs set-build + probe only.
  * Inputs MUST be duplicate-free (graft's shingle expressions are).
  */
case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_jaccard"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[ArrayData]
    var b = r.asInstanceOf[ArrayData]
    if (a.numElements() > b.numElements()) { val t = a; a = b; b = t }
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0) return if (nb == 0) 1.0 else 0.0
    val set = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < nb) {
      if (set.contains(b.getUTF8String(j))) inter += 1
      j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}
