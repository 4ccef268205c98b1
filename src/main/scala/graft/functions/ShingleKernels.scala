package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass k-char shingle-set kernels, replacing the interpreted
  * `array_distinct(transform(sequence(...), i => substr(...)))`
  * formulations (one interpreted substr eval per shingle, plus per-char
  * ascii×shift evals for the packed variant). Bit-exact with the column
  * formulations they replace — distinct with FIRST-OCCURRENCE order (the
  * `array_distinct` contract), `substr` char (code point) semantics,
  * shingles of texts shorter than k clamp to the whole text, the empty
  * text yields one empty shingle — asserted by ShingleKernelsSpec.
  */
object ShingleKernels {

  /** Distinct k-char shingles in first-occurrence order. Shingle bytes
    * are addressed through [[TextKernels.charOffsets]] — substringSQL
    * re-walks from byte 0 per gram, O(n^2) in doc length, the per-row
    * cliff the other kernels already eliminated. */
  def shingleSet(text: UTF8String, k: Int): ArrayData = {
    val nChars = text.numChars()
    val n = math.max(nChars - k + 1, 1)
    val bytes = text.getBytes
    val charOff = TextKernels.charOffsets(text)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < n) {
      seen.add(UTF8String.fromBytes(bytes, charOff(i),
        charOff(math.min(i + k, nChars)) - charOff(i)))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Distinct k-char shingles packed base-256 per code point (ASCII text:
    * injective; mirrors `ascii(substr(...)) * 2^(8(k-1-j))` summed, with
    * positions past the end contributing ascii('') = 0).
    *
    * ASCII-ONLY precondition, loudly: a code point > 255 carries into the
    * next 8-bit lane, so on non-ASCII text DISTINCT shingles can pack to
    * one value (cps (1,354) and (2,98) both pack to 610 at k=2) and
    * packed-shingle Jaccard inflates — with no error, because the oracle
    * mirrors the same lane arithmetic and agrees bit-for-bit. Callers on
    * non-ASCII corpora must pass `packedAscii = false` (the string-shingle
    * path is exact for any text). */
  def packedShingleSet(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    // code points left-to-right (substr counts chars = code points)
    val nChars = text.numChars()
    val cps = new Array[Long](nChars)
    var ci = 0
    var si = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp.toLong
      ci += 1
      si += Character.charCount(cp)
    }
    val n = math.max(nChars - k + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      var v = 0L
      var j = 0
      while (j < k) {
        val cp = if (i + j < nChars) cps(i + j) else 0L
        v += cp << (8 * (k - 1 - j))
        j += 1
      }
      seen.add(v)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** `shingle_set(text)` → `array<string>` of distinct k-char shingles. */
case class ShingleSet(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.shingleSet(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.shingleSet($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  /** Column wrapper. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(text), k))
}

/** `packed_shingle_set(text)` → `array<long>` of distinct packed shingles. */
case class PackedShingleSet(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0 && k <= 7, s"packed shingles support k in (0, 7], got $k")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_shingle_set"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.packedShingleSet(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.packedShingleSet($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): PackedShingleSet =
    copy(child = newChild)
}

object PackedShingleSet {
  /** Column wrapper. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(PackedShingleSet(ColumnBridge.expression(text), k))
}
