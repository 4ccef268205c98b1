package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Int8 embedding-quantization kernels. Symmetric max-abs quantization
  * (the standard public int8 scheme): `q_i = floor(x_i·127/maxabs + 0.5)`
  * per vector, so values land in [−127, 127] and the per-vector scale
  * `maxabs/127` is implicit. The pipeline payoff at 100 TB: a 64-float
  * embedding stores in 1/4 the bytes, and COSINE over quantized vectors
  * needs no scale at all — the per-vector scales cancel, leaving an
  * integer dot product over int8 values (exact on any engine) divided by
  * the integer self-norms. `floor(x + 0.5)` is chosen over banker's or
  * half-away rounding because every SQL engine can mirror it verbatim.
  */
object QuantKernels {

  /** q_i = floor(x_i·127/maxabs + 0.5); all-zero (or empty) vectors map
    * to all-zero quantized vectors. Element math in double, mirroring
    * `floor(CAST(x AS DOUBLE) * 127 / maxabs + 0.5)` exactly. */
  def quantizeInt8(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > ma) ma = a
      i += 1
    }
    val out = new Array[Int](n)
    if (ma > 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(vec.getFloat(i).toDouble * 127.0 / ma + 0.5).toInt
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Σ a_i·b_i over int arrays, accumulated in long (exact — no overflow
    * for any int8-quantized input below ~5·10¹⁴ dimensions). */
  def intDotProduct(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }
}

/** `quantize_int8(array<float>)` → `array<int>` in [−127, 127]. */
case class QuantizeInt8(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  override protected def nullSafeEval(input: Any): Any =
    QuantKernels.quantizeInt8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantKernels.quantizeInt8($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Column wrapper. */
  def apply(vec: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(vec)))
}

/** `int_dot_product(array<int>, array<int>)` → `long`. */
case class IntDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "int_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantKernels.intDotProduct(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.QuantKernels.intDotProduct($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object IntDotProduct {
  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(IntDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
