package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** N-column Morton / Z-order key (2 ≤ N ≤ 4): bit i of column j lands on
  * position `i*N + j`, so all dimensions share the high bits evenly and a
  * range partition on the key bounds EVERY dimension's span per file —
  * the generalization of [[InterleaveBits]] that real layout jobs need
  * (cluster on (host, path, time), not just two ids). Each column
  * contributes its low 64/N bits; inputs are expected pre-normalized to
  * a common range ([[graft.operators.Layout.zorderWrite]] does this).
  */
case class ZOrderKey(children: Seq[Expression])
  extends Expression with ExpectsInputTypes {

  require(children.size >= 2 && children.size <= 4,
    s"zorder_key takes 2-4 columns, got ${children.size}")

  override def inputTypes = Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorder_key"

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var z = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      if (v == null) return null
      z |= ZOrderKey.spreadN(v.asInstanceOf[Long], k) << j
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCheck = evals.map(e => e.isNull.toString).mkString(" || ")
    val terms = evals.zipWithIndex.map { case (e, j) =>
      s"(graft.functions.ZOrderKey.spreadN(${e.value}, $k) << $j)"
    }.mkString(" | ")
    ev.copy(code = code"""
      $childCode
      boolean ${ev.isNull} = $nullCheck;
      long ${ev.value} = ${ev.isNull} ? 0L : ($terms);""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKey {
  def apply(cols: Seq[Column])(implicit d: DummyImplicit): Column =
    ColumnBridge.column(ZOrderKey(cols.map(ColumnBridge.expression)))

  /** Place the low ⌊64/k⌋ bits of x on positions 0, k, 2k, … */
  def spreadN(x: Long, k: Int): Long = {
    val bits = 64 / k
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (i * k)
      i += 1
    }
    z
  }
}
