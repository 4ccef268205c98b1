package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compressibility kernel — the classic "too compressible = boilerplate /
  * template spam, too incompressible = binary junk or ciphertext" corpus
  * quality signal (deflate ratio band-pass filtering, as used by public
  * web-corpus pipelines alongside the length/punct/stopword heuristics in
  * `TextAnalysis.qualityScorePpm`).
  *
  * DEFLATE (RFC 1951) at the default level over the row's UTF-8 bytes,
  * raw stream (no zlib wrapper), via `java.util.zip.Deflater`. One pass,
  * no allocation proportional to output (counting discards the buffer).
  * Deflater instances are thread-local and reset per row: allocating one
  * per row would churn native memory; sharing without reset would leak
  * state across rows. The thread-local is never `end()`d — bounded by the
  * executor thread count, reclaimed with the JVM.
  */
object CompressionKernels {

  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Size in bytes of the raw-deflate stream of `s`'s UTF-8 bytes. */
  def deflatedLen(s: UTF8String): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(b)
    total
  }
}

/** `deflate_len(text)` → `long` compressed byte count (raw DEFLATE). */
case class DeflateLen(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    CompressionKernels.deflatedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressionKernels.deflatedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Column wrapper. */
  def apply(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}
