package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Hilbert-curve index (the locality upgrade over Morton/Z-order):
  * maps a point on the 2^bits × 2^bits grid to its position along the
  * Hilbert space-filling curve via the classic quadrant-rotation walk
  * (Hilbert 1891; the iterative form follows Warren, Hacker's Delight
  * §16-2 / the well-known xy2d formulation). Unlike the Z-curve, EVERY
  * pair of consecutive curve positions is a grid-adjacent pair — no
  * quadrant-boundary jumps — so consecutive key ranges cover more compact
  * boxes and range-partitioned files get tighter min-max stats on both
  * dimensions (HilbertKeySpec quantifies the win against
  * [[InterleaveBits]] chunk for chunk).
  *
  * Inputs are pre-normalized longs in [0, 2^bits) ([[graft.operators.
  * Layout.hilbertWrite]] does the range normalization); out-of-range
  * bits above `bits` are masked off. Codegen'd via a static helper,
  * same pattern as [[ZOrderKey]].
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"hilbert_key bits must be in [1, 31], got $bits")

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertKey.xy2d($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {
  /** Column wrapper. */
  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertKey(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** Grid point → Hilbert curve position. */
  def xy2d(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation lines up
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert curve position → grid point (spec-side inverse). */
  def d2xy(dIn: Long, bits: Int): (Long, Long) = {
    var x = 0L
    var y = 0L
    var t = dIn
    var s = 1L
    while (s < (1L << bits)) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}
