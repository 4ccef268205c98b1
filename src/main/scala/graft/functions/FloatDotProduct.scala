package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float arrays accumulated in double, as a native
  * codegen'd expression: one fused loop, no per-row array allocation.
  * Replaces `aggregate(zip_with(a, b, _*_), 0d, _+_)` — higher-order
  * functions are interpreted per element and allocate an intermediate
  * array, which dominates pairwise similarity joins.
  *
  * Summation is sequential left-to-right with each element widened to
  * double first — bit-identical to the higher-order-function formulation
  * on EQUAL-length arrays (every embedding table's contract), so
  * oracle-checked results are unchanged. Lengths are deliberately
  * min-clamped on mismatch, matching [[IntDotProduct]]'s spec'd
  * length-min semantics (QuantizationSpec) — note the old HOF returned
  * NULL there instead (zip_with pads with nulls): a corpus with
  * corrupt truncated vectors scores them as partial dot products rather
  * than visibly-broken NULL rows, so validate dimensions at ingest if
  * that matters.
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object FloatDotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
