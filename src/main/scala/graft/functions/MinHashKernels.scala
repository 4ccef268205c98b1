package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel. Replaces the explode → 64-way
  * min-aggregate formulation: that shape blew each document up into one
  * row per character shingle and paid a full hash shuffle for the groupBy,
  * where the signature is really a per-row projection. The kernel computes
  * all `perms` permutation minima in a single pass over the shingles, so
  * the signature table needs NO shuffle at all — at 100 TB that removes
  * the largest exchange from the MinHash dedup pipeline.
  *
  * Bit-exactness with the former formulation (MinHashKernelsSpec):
  * shingles are `substr(text, i, k)` for i in 1..max(len-k+1, 1) (char
  * semantics, non-distinct — min over a multiset equals min over the
  * set); shingle hash = xxhash64(shingle) (seed 42 over UTF-8 bytes);
  * permutation hash = xxhash64(p, h) (int then long, chained from 42).
  */
object MinHashKernels {

  def minhashSig(text: UTF8String, k: Int, perms: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nBytes = text.numBytes()
    val nChars = text.numChars()
    val n = math.max(nChars - k + 1, 1)
    val mins = new Array[Long](perms)
    val seeds = new Array[Long](perms)
    var p = 0
    while (p < perms) {
      mins(p) = Long.MaxValue
      seeds(p) = XXH64.hashInt(p, 42L)
      p += 1
    }
    // hash each shingle's bytes in place via the shared offset table
    // (TextKernels.charOffsets) instead of substringSQL per shingle —
    // bit-identical hashes (MinHashKernelsSpec's reference equality)
    val charOff = TextKernels.charOffsets(text)
    var i = 0
    while (i < n) {
      val s = charOff(i)
      val e = charOff(math.min(i + k, nChars))
      val h = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      p = 0
      while (p < perms) {
        val hp = XXH64.hashLong(h, seeds(p))
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Count of positions where the two long arrays agree (positional, up to
    * the shorter length) — the MinHash signature-agreement estimator,
    * replacing the per-pair interpreted `size(filter(zip_with(...)))`.
    *
    * Signature arrays are containsNull=false by construction, but the
    * function is also registered for arbitrary SQL callers, so a null slot
    * (in either array) is treated as agreeing with nothing — SQL equality
    * semantics — rather than silently read as 0 on the unsafe path. */
  def positionalEqCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

/** `minhash_sig(text)` → `array<long>` of `perms` permutation minima over
  * `k`-character shingles (k and perms baked into the plan as literals). */
case class MinHashSig(child: Expression, k: Int, perms: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")
  require(perms > 0, s"perms must be positive, got $perms")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernels.minhashSig(input.asInstanceOf[UTF8String], k, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashKernels.minhashSig($c, $k, $perms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column wrapper. */
  def apply(text: Column, k: Int, perms: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(text), k, perms))
}

/** `positional_eq_count(array<long>, array<long>)` → `long`. */
case class PositionalEqCount(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "positional_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashKernels.positionalEqCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MinHashKernels.positionalEqCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionalEqCount =
    copy(left = newLeft, right = newRight)
}

object PositionalEqCount {
  /** Column wrapper. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(PositionalEqCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
