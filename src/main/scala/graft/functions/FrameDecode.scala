package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `frame_decode(bytes)` → the original payload of a
  * [[graft.state.Compressor]] self-describing frame (1-byte marker +
  * passthrough or LZ4 block). This is the codegen'd read leg of the
  * external snapshot store: `ExternalSnapshots.readLatest` previously
  * decompressed through an interpreted `mapPartitions` row-copy loop —
  * the only non-codegen stage on the state read path; as an Expression
  * the decode stays inside the projection (whole-stage codegen, column
  * pruning intact) and SQL readers of the store get it via the
  * `frame_decode` registration in GraftExtensions. */
case class FrameDecode(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "frame_decode"

  override protected def nullSafeEval(input: Any): Any =
    graft.state.Compressor.decodeFrame(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.state.Compressor$$.MODULE$$.decodeFrame($c)")

  override protected def withNewChildInternal(newChild: Expression): FrameDecode =
    copy(child = newChild)
}

object FrameDecode {
  /** Column wrapper. */
  def apply(bytes: Column): Column =
    ColumnBridge.column(FrameDecode(ColumnBridge.expression(bytes)))
}
