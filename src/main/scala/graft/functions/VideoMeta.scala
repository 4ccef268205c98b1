package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Header-only video metadata from raw bytes: an ISO-BMFF / MP4 box walk
  * (ISO/IEC 14496-12, the public container layout — 4-byte big-endian
  * size + 4-byte type, `size==1` → 64-bit largesize, containers nest).
  * Extracts the `ftyp` major brand, movie duration from `moov/mvhd`
  * (version 0 and 1 layouts), and presentation width/height from the
  * first `moov/trak/tkhd` with nonzero dimensions (16.16 fixed point at
  * the end of the box, same offset-from-end in both versions).
  *
  * No codec — pure byte arithmetic over the first ~KB, the route/reject
  * stage that precedes any frame decode at 100 TB. Unrecognized or
  * truncated containers yield null.
  */
object VideoHeader {

  import ByteReads.{be32L => be32, be64, tag}

  private final class Acc {
    var brand: String = null
    var timescale: Long = -1
    var duration: Long = -1
    var width: Int = 0
    var height: Int = 0
  }

  /** Walk boxes in [from, to); recurse into containers. */
  private def walk(b: Array[Byte], from: Int, to: Int, depth: Int, acc: Acc): Boolean = {
    if (depth > 8) return false
    var i = from
    while (i + 8 <= to) {
      val size32 = be32(b, i)
      val boxType = tag(b, i + 4)
      var header = 8L
      val size: Long =
        if (size32 == 1L) {
          if (i + 16 > to) return false
          header = 16L; be64(b, i + 8)
        } else if (size32 == 0L) (to - i).toLong // box extends to end
        else size32
      if (size < header || i + size > to.toLong) return false
      val body = i + header.toInt
      val end = (i + size).toInt
      boxType match {
        case "ftyp" =>
          if (body + 4 <= end) acc.brand = tag(b, body)
        case "moov" | "trak" =>
          if (!walk(b, body, end, depth + 1, acc)) return false
        case "mvhd" =>
          if (body + 4 > end) return false // version+flags must exist
          val v = b(body) & 0xff
          if (v == 1) {
            if (body + 32 + 8 > end) return false
            acc.timescale = be32(b, body + 20)
            acc.duration = be64(b, body + 24)
          } else {
            if (body + 16 + 4 > end) return false
            acc.timescale = be32(b, body + 12)
            acc.duration = be32(b, body + 16)
          }
        case "tkhd" =>
          // width/height are the last 8 bytes in both versions (16.16)
          if (end - 8 >= body && acc.width == 0 && acc.height == 0) {
            val w = (be32(b, end - 8) >> 16).toInt
            val h = (be32(b, end - 4) >> 16).toInt
            if (w > 0 && h > 0) { acc.width = w; acc.height = h }
          }
        case _ => // skip unknown boxes by declared size
      }
      i = end
    }
    true
  }

  /** (brand, width, height, durationMs) or null. */
  def parse(b: Array[Byte]): (String, Int, Int, Long) = {
    if (b == null || b.length < 16) return null
    // sanity: first box type must be a known top-level (ftyp/moov/…)
    val first = tag(b, 4)
    if (first != "ftyp" && first != "moov" && first != "styp") return null
    val acc = new Acc
    if (!walk(b, 0, b.length, 0, acc)) return null
    if (acc.timescale <= 0 || acc.duration < 0) return null
    if (acc.width <= 0 || acc.height <= 0) return null
    val brand = if (acc.brand == null) "mp4" else acc.brand
    (brand, acc.width, acc.height, acc.duration * 1000L / acc.timescale)
  }

  /** Catalyst-row variant for the codegen path (null = unrecognized). */
  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(p._1), p._2, p._3, p._4))
  }
}

/** `video_meta(binary)` → `struct<brand:string, width:int, height:int,
  * duration_ms:bigint>`, null when the payload is not an ISO-BMFF
  * container. Generated code is one static call (stays in whole-stage
  * codegen). */
case class VideoMeta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else VideoHeader.parseRow(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $rowCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.VideoHeader.parseRow(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {
  /** Column wrapper. */
  def apply(payload: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(payload)))
}
