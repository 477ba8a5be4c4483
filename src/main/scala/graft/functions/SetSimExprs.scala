package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two `array<string>` columns in one pass:
  * hash-set build + probe, |∩| / |∪| over DISTINCT elements — the same
  * value as `size(array_intersect(a,b))/size(array_union(a,b))` (both
  * built-ins dedup), without allocating the two intermediate arrays per
  * row, which dominates on millions of candidate pairs. The
  * [[graft.plans.GraftExtensions]] optimizer rule rewrites the composed
  * form into this expression. Real codegen via [[NativeEval]].
  */
/** Cosine similarity of two numeric vector columns (`array<float>` or
  * `array<double>` on either side — floats widen exactly), computed as a
  * single native pass with left-to-right accumulation: bit-identical to
  * sequential dot products in any engine. Replaces the interpreted
  * `zip_with`+`aggregate` composition, which dominates pairwise
  * similarity workloads. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // float and double vectors both accepted; mixed widths widen exactly
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(org.apache.spark.sql.graft.GraftSql.typeCollection(
          ArrayType(FloatType), ArrayType(DoubleType)),
        org.apache.spark.sql.graft.GraftSql.typeCollection(
          ArrayType(FloatType), ArrayType(DoubleType)))

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"cosine over $t")
  }
  private lazy val lFloat = isFloat(left)
  private lazy val rFloat = isFloat(right)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    NativeEval.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NativeEval.cosine($a, $b, $lFloat, $rFloat)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Jaccard of two SORTED distinct `array<long>` columns (the
  * [[CharShingleHashes]] form): one merge pass, no per-row hash set.
  * Same empty-empty → NULL edge semantics as [[ArrayJaccard]]. */
case class ArrayJaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_jaccard_sorted"
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() == 0 && b.numElements() == 0) null
    else NativeEval.arrayJaccardSortedLong(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() == 0 && $b.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.NativeEval.arrayJaccardSortedLong($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayJaccardSorted =
    copy(left = newLeft, right = newRight)
}

/** [[ArrayJaccardSorted]] with a baked-in qualification threshold
  * (r17): evaluates to the exact jaccard when the pair can still reach
  * `threshold`, and to -1.0 the moment the merge's remaining-overlap
  * bound proves it cannot (see
  * [[NativeEval.arrayJaccardSortedLongBounded]] for the soundness
  * argument). Built for the candidate-verify hot path, where the value
  * feeds a `>= threshold` filter immediately: kept rows carry the
  * identical exact value [[ArrayJaccardSorted]] would, dropped rows
  * drop either way — so swapping the kernels is plan-only. The merge
  * exits after ~(1+t)/2·min(|A|,|B|) − t·max/… steps on hopeless pairs
  * instead of scanning both arrays to the end — the saving grows as
  * candidate similarity falls below t. Same empty-empty → NULL edge as
  * [[ArrayJaccardSorted]]. */
case class ArrayJaccardSortedBounded(left: Expression, right: Expression,
                                     threshold: Double)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_jaccard_sorted_bounded"
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() == 0 && b.numElements() == 0) null
    else NativeEval.arrayJaccardSortedLongBounded(a, b, threshold)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() == 0 && $b.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.NativeEval.arrayJaccardSortedLongBounded(
         |    $a, $b, $threshold);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayJaccardSortedBounded =
    copy(left = newLeft, right = newRight)
}

/** 512-bit parity (odd) sketch of a sorted distinct hashed-shingle
  * array ([[NativeEval.paritySketch]]) — built once per doc on the
  * verify side so candidate pairs can be bound-checked in ~10 ns
  * before the merge kernel runs. Never null-on-null beyond the usual
  * unary propagation; an empty array yields the all-zero sketch. */
case class ParitySketch(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_parity_sketch"

  override protected def nullSafeEval(v: Any): Any =
    NativeEval.paritySketch(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.NativeEval.paritySketch($a)")

  override protected def withNewChildInternal(newChild: Expression): ParitySketch =
    copy(child = newChild)
}

/** popcount(a XOR b) of two [[ParitySketch]] signatures — the h of the
  * deterministic Jaccard upper bound J ≤ (S−h)/(S+h) (soundness at
  * [[NativeEval.paritySketch]]). */
case class XorPopcount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_xor_popcount"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    NativeEval.xorPopcount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.NativeEval.xorPopcount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): XorPopcount =
    copy(left = newLeft, right = newRight)
}

case class ArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_array_jaccard"

  // Two empty arrays → null, matching the composed form this expression
  // replaces: size(array_intersect)/size(array_union) is 0/0 = NULL with
  // ANSI off. The fusion rule must not change results on edge inputs.
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (a.numElements() == 0 && b.numElements() == 0) null
    else NativeEval.arrayJaccard(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() == 0 && $b.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.NativeEval.arrayJaccard($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayJaccard =
    copy(left = newLeft, right = newRight)
}
