package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Byte-level feature extraction over `binary` columns — the multimodal
  * pipeline's codec-free featurizer (image decode itself is
  * [[graft.operators.Multimodal.imageioDecode]]; these byte features
  * apply to ANY payload — including audio/video formats the JDK cannot
  * decode — keeping schema, partitioning and batch shape uniform).
  */

/** 16-bin histogram of a binary payload by high nibble (byte >> 4):
  * array<long> of length 16. Null payload → null. */
case class ByteBinCounts(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_byte_bin_counts"

  override protected def nullSafeEval(input: Any): Any =
    NativeEval.byteBinCounts(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeEval.byteBinCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteBinCounts =
    copy(child = newChild)
}

/** Every `stride`-th byte of a binary payload — the frame-sampling /
  * thumbnail analogue for opaque media payloads. */
case class ByteSample(child: Expression, stride: Int) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.GraftSql.AbstractDataType] = Seq(BinaryType)
  require(stride > 0)

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_byte_sample"

  override protected def nullSafeEval(input: Any): Any =
    NativeEval.byteSample(input.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeEval.byteSample($c, $stride)")

  override protected def withNewChildInternal(newChild: Expression): ByteSample =
    copy(child = newChild)
}
