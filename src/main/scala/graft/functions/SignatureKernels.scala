package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native one-pass signature kernels. Both replace higher-order-function
  * formulations (`aggregate`/`zip_with`) that Spark evaluates interpreted:
  * the SimHash vote was 64 separate interpreted array traversals per
  * document and the hyperplane signature was `planes` traversals per
  * vector. Each kernel is a single static call from generated code, so the
  * projection stays inside whole-stage codegen — the per-row analogue of
  * the per-pair discipline set by [[SortedIntersectCount]].
  *
  * Bit-exactness: both kernels reproduce the column formulations they
  * replaced (same xxhash64 seeding, same left-to-right double
  * accumulation), asserted by SignatureKernelsSpec against the original
  * higher-order expressions.
  */
object SignatureKernels {

  /** ±1 vote of one hash into the 64 counters (shared between the
    * array-input and fused-text SimHash kernels so the tie-break rule can
    * never diverge). */
  def vote(votes: Array[Int], h: Long): Unit = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
      j += 1
    }
  }

  /** Collapse vote counters to the signature: bit set iff strictly
    * positive. */
  def collapseVotes(votes: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** 64-bit SimHash from token hashes: bit j set iff the sum of ±1 votes
    * (bit j of each hash) is positive. One pass, 64 counters. */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      vote(votes, hashes.getLong(i))
      i += 1
    }
    collapseVotes(votes)
  }

  /** `planes`-bit random-hyperplane signature of a float vector. Plane p's
    * component for dimension d is ±1 by the parity of xxhash64(p, d) with
    * Spark's default seed 42 — identical to the former column formulation
    * `xxhash64(lit(p), d).bitwiseAND(1) === 0`, and the projection
    * accumulates left-to-right in double exactly as `aggregate` did. */
  def rhpSignature(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      val seed = XXH64.hashInt(p, 42L)
      var proj = 0.0
      var d = 0
      while (d < n) {
        val sign = if ((XXH64.hashInt(d, seed) & 1L) == 0L) 1.0 else -1.0
        proj += vec.getFloat(d).toDouble * sign
        d += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** `simhash64(array<long>)` → `long`: one-pass 64-bit SimHash vote. */
case class SimHash64(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SignatureKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column wrapper. */
  def apply(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
}

/** `rhp_signature(array<float>)` → `long`: `planes`-bit random-hyperplane
  * LSH signature (planes baked into the plan as a literal). */
case class RhpSignature64(child: Expression, planes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(planes > 0 && planes <= 64, s"planes must be in (0, 64], got $planes")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_signature"

  override protected def nullSafeEval(input: Any): Any =
    SignatureKernels.rhpSignature(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SignatureKernels.rhpSignature($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): RhpSignature64 =
    copy(child = newChild)
}

object RhpSignature64 {
  /** Column wrapper. */
  def apply(vec: Column, planes: Int): Column =
    ColumnBridge.column(RhpSignature64(ColumnBridge.expression(vec), planes))
}
