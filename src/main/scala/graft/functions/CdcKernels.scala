package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): split a document at ROLLING-HASH
  * boundaries instead of fixed offsets, so an insertion or deletion moves
  * only the chunk it touches — every later boundary re-synchronizes on
  * content. The storage-dedup literature's answer (Muthitacharoen et al.,
  * LBFS, SOSP 2001; FastCDC, Xia et al., ATC 2016) to the one duplication
  * family fixed shingles and MinHash handle poorly: long documents that
  * are byte-identical except for a small edit (mirrors, re-crawls with an
  * injected banner, versioned pages).
  *
  * Gear rolling hash (`h = (h << 1) + gear[byte]`, FastCDC's): the shift
  * ages bytes out of the 64-bit state, so a boundary depends only on the
  * recent byte window; the hash resets at each cut. Boundary rule:
  * `(h & mask) == 0` with `avg = 2^avgBits` target chunk size, clamped to
  * `[avg/4, 4*avg]` (min suppresses pathological short chunks, max forces
  * progress on boundary-free bytes). Each chunk is emitted as its
  * xxhash64(seed 42) digest — the join key for shared-chunk pair joins.
  */
object CdcKernels {

  /** Deterministic 256-entry gear table, SplitMix64 from a fixed seed. */
  private val Gear: Array[Long] = {
    var x = 42L
    Array.fill(256) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  def cdcChunks(text: UTF8String, avgBits: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val mask = (1L << avgBits) - 1L
    val minLen = math.max(1, (1 << avgBits) / 4)
    val maxLen = (1 << avgBits) * 4
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / (1 << avgBits) + 2)
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xFF)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out += XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, len, 42L)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n)
      out += XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + start, n - start, 42L)
    new GenericArrayData(out.toArray)
  }
}

/** `cdc_chunks(text, avgBits)` → `array<long>` of chunk digests. */
case class CdcChunks(child: Expression, avgBits: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(avgBits >= 2 && avgBits <= 24, s"avgBits must be in [2, 24], got $avgBits")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcKernels.cdcChunks(input.asInstanceOf[UTF8String], avgBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcKernels.cdcChunks($c, $avgBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  /** Column wrapper. */
  def apply(text: Column, avgBits: Int): Column =
    ColumnBridge.column(CdcChunks(ColumnBridge.expression(text), avgBits))
}
