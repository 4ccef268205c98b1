package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass gram digests for the duplicate-span signal
  * (`q_substring_dup`'s production path): xxhash64 over the UTF-8 bytes of
  * every k-CHAR gram, addressed in place through the shared char-offset
  * table — no per-gram substring materialization, no md5, an 8-byte
  * shuffle key instead of a 32-hex string. The exact-md5 path stays the
  * declared oracle demo (the doc_profile / doc_profile_fast precedent).
  */
object SpanKernels {

  /** All k-char gram hashes of `text`, in position order (empty when the
    * text is shorter than k). Char-based like substringSQL, byte-addressed
    * like the minhash/winnow kernels. */
  def gramDigests(text: UTF8String, k: Int): GenericArrayData = {
    val nChars = text.numChars()
    val n = nChars - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val charOff = TextKernels.charOffsets(text)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val b0 = charOff(i)
      out(i) = XXH64.hashUnsafeBytes(base, off + b0, charOff(i + k) - b0, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `gram_digests(text, k)` → `array<long>` (one hash per char position). */
case class GramDigests(child: Expression, k: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_digests"

  override protected def nullSafeEval(input: Any): Any =
    SpanKernels.gramDigests(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanKernels.gramDigests($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramDigests =
    copy(child = newChild)
}

object GramDigests {
  /** Column wrapper. */
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(GramDigests(ColumnBridge.expression(text), k))
}
