package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter kernels for broadcast membership prefilters — the runtime-
  * filter shape for decontamination at 100 TB: the eval-set gram filter is
  * a few hundred KB of bits, ships to every executor as a plan literal,
  * and rejects the overwhelming majority of train-side grams MAP-SIDE,
  * before they ever reach the (still exact) broadcast-hash verify join.
  *
  * Classic Bloom construction (Bloom 1970) with Kirsch–Mitzenmacher double
  * hashing (h1 + i·h2 — two xxhash64 evaluations give all k probes): both
  * the build-side position enumeration ([[BloomPositions]]) and the
  * probe-side membership test ([[BloomMightContain]]) call the SAME static
  * formula, so false negatives are impossible by construction.
  *
  * `bits` must be a power of two (mask-mod). xxhash64 seeds chain from 42,
  * matching every other hash kernel in the suite.
  */
object BloomKernels {

  private def checkShape(bits: Int, hashes: Int): Unit = {
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"bits must be a power of two >= 64, got $bits")
    require(hashes > 0 && hashes <= 16, s"hashes must be in 1..16, got $hashes")
  }

  /** The i-th probe position of `s` in a `bits`-wide filter. */
  private def position(h1: Long, h2: Long, i: Int, mask: Int): Int =
    ((h1 + i.toLong * h2) & mask).toInt

  private def h1(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  // odd stride so successive probes cover the table for pow2 sizes
  private def h2(h1: Long): Long = XXH64.hashLong(h1, 4242L) | 1L

  /** All `hashes` probe positions for `s` — the BUILD side. */
  def positions(s: UTF8String, bits: Int, hashes: Int): GenericArrayData = {
    val a = h1(s); val b = h2(a); val mask = bits - 1
    val out = new Array[Int](hashes)
    var i = 0
    while (i < hashes) { out(i) = position(a, b, i, mask); i += 1 }
    new GenericArrayData(out)
  }

  /** Membership test against packed filter words — the PROBE side. */
  def mightContain(s: UTF8String, words: Array[Long], bits: Int, hashes: Int): Boolean = {
    val a = h1(s); val b = h2(a); val mask = bits - 1
    var i = 0
    while (i < hashes) {
      val p = position(a, b, i, mask)
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Validated empty word array for a `bits`-wide filter. */
  def emptyWords(bits: Int, hashes: Int): Array[Long] = {
    checkShape(bits, hashes)
    new Array[Long](bits >>> 6)
  }
}

/** `bloom_positions(s)` → `array<int>` of the `hashes` probe positions in a
  * `bits`-wide filter (build side; bits/hashes baked as plan literals). */
case class BloomPositions(child: Expression, bits: Int, hashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  BloomKernels.emptyWords(bits, hashes) // shape validation at plan time

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bloom_positions"

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.positions(input.asInstanceOf[UTF8String], bits, hashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernels.positions($c, $bits, $hashes)")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)
}

object BloomPositions {
  /** Column wrapper. */
  def apply(s: Column, bits: Int, hashes: Int): Column =
    ColumnBridge.column(BloomPositions(ColumnBridge.expression(s), bits, hashes))
}

/** `bloom_might_contain(s)` → boolean membership test against a driver-built
  * filter carried in the plan (broadcast with the task binary — a few
  * hundred KB for a million-gram eval set). False positives only; the
  * caller MUST re-verify exactly (contaminationBloom's broadcast join). */
case class BloomMightContain(child: Expression, words: Array[Long], hashes: Int)
  extends UnaryExpression with ExpectsInputTypes {

  private val bits = words.length << 6
  BloomKernels.emptyWords(bits, hashes) // shape validation at plan time

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomKernels.mightContain(input.asInstanceOf[UTF8String], words, bits, hashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomKernels.mightContain($c, $ref, $bits, $hashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column wrapper. */
  def apply(s: Column, words: Array[Long], hashes: Int): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(s), words, hashes))
}
