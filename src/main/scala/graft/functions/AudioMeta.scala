package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Header-only audio metadata from raw bytes: a RIFF/WAVE chunk walk (the
  * public container format — "RIFF" size "WAVE", then id/size chunks padded
  * to even offsets) that extracts the `fmt ` block (codec tag, channels,
  * sample rate, byte rate, bits per sample) and the declared `data` payload
  * size, from which the duration follows. No codec, pure byte arithmetic —
  * the cheap route/reject stage before any sample decode at 100 TB.
  *
  * Chunks may appear in any order and unknown chunks (LIST, fact, cue …)
  * are skipped by declared size; the walk trusts the `data` size field even
  * when the payload itself is not materialized (header-only inputs), which
  * is what a metadata pass over opaque blobs wants. Unrecognized or
  * truncated headers yield null.
  */
object AudioHeader {

  import ByteReads.{le16, le32L => le32, tag}

  /** (codec, channels, sampleRate, bitsPerSample, durationMs) or null. */
  def parse(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (b == null || b.length < 20) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')) return null
    if (!(b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var i = 12
    var fmtTag = -1; var channels = -1; var rate = -1; var byteRate = -1L; var bits = -1
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmtTag < 0 || dataBytes < 0)) {
      val id = tag(b, i)
      val size = le32(b, i + 4)
      if (size < 0) return null
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > b.length) return null
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataBytes = size // declared size; payload need not be materialized
      }
      // advance past the chunk, padded to an even boundary (long math so a
      // bogus 4 GiB declared size can't wrap the cursor negative)
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > b.length.toLong) b.length else next.toInt
    }
    if (fmtTag < 0 || dataBytes < 0) return null
    if (channels <= 0 || rate <= 0 || bits <= 0 || byteRate <= 0) return null
    val codec = fmtTag match {
      case 1      => "pcm"
      case 3      => "float"
      case 0xfffe => "extensible"
      case _      => "other"
    }
    val durationMs = dataBytes * 1000L / byteRate
    (codec, channels, rate, bits, durationMs)
  }

  /** Catalyst-row variant for the codegen path (null = unrecognized). */
  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(p._1), p._2, p._3, p._4, p._5))
  }
}

/** `audio_meta(binary)` → `struct<codec:string, channels:int,
  * sample_rate:int, bits:int, duration_ms:bigint>`, null when the payload
  * is not a RIFF/WAVE container. Generated code is one static call, so the
  * projection stays inside whole-stage codegen.
  */
case class AudioMeta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else AudioHeader.parseRow(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $rowCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.AudioHeader.parseRow(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  /** Column wrapper. */
  def apply(payload: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(payload)))
}
