package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Header-only image metadata extraction from raw bytes — no codec, pure
  * byte arithmetic over the public container formats, so it runs inside
  * whole-stage codegen on opaque `binary` media columns:
  *
  *   - PNG  (ISO/IEC 15948): 8-byte signature, IHDR width/height big-endian
  *   - JPEG (ITU-T T.81): segment walk to the first SOFn frame header
  *   - GIF  (GIF87a/GIF89a): logical-screen width/height little-endian
  *   - BMP  (BITMAPINFOHEADER): width/height little-endian at 18/22
  *
  * Unrecognized or truncated payloads yield null (the caller decides how to
  * treat non-image media). Used by `Multimodal.decodeFeatures` as the real
  * decode path in front of the documented stub; at 100 TB this is the cheap
  * "reject/route by container metadata" stage that runs before any actual
  * pixel decode, reading only the first ~KB of each blob.
  *
  * Reference-scale rationale: the reference treats payloads as opaque bytes
  * with user codecs (`core/.../package.scala:6-9`); this is the analogous
  * typed-metadata view for media payloads.
  */
object ImageHeader {

  import ByteReads.{be16, be32, le16, le32}

  /** (format, width, height) or null when the payload is not a recognized
    * image container. Reads header bytes only. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null || b.length < 10) return null
    // PNG: \x89PNG\r\n\x1a\n + IHDR chunk (length 13, type "IHDR")
    if (b.length >= 24 &&
        b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0) return ("png", w, h) else return null
    }
    // GIF87a / GIF89a: logical screen descriptor, little-endian
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) return ("gif", w, h) else return null
    }
    // BMP: "BM" + DIB header. Validate the DIB header-size field before
    // trusting offsets: BITMAPINFOHEADER family (40/52/56/64/108/124) has
    // 32-bit dims at 18/22 (height may be negative for top-down rows —
    // report magnitude); the OS/2 BITMAPCOREHEADER (12) has 16-bit dims at
    // 18/20; anything else is not a layout we can read → null, never
    // garbage dimensions.
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = le32(b, 14)
      if (dib == 12) {
        val w = le16(b, 18); val h = le16(b, 20)
        if (w > 0 && h > 0) return ("bmp", w, h) else return null
      } else if (dib == 16 || dib == 40 || dib == 52 || dib == 56 ||
                 dib == 64 || dib == 108 || dib == 124) {
        // BITMAPINFOHEADER family (40/52/56/64/108/124) and the OS/2 2.x
        // BITMAPCOREHEADER2 16-byte form all share 32-bit dims at 18/22;
        // any other declared size is not a layout we know → null
        val w = le32(b, 18); val h = math.abs(le32(b, 22))
        if (w > 0 && h > 0) return ("bmp", w, h) else return null
      } else return null
    }
    // JPEG: SOI then marker segments until the first frame header (SOFn).
    if (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) {
      var i = 2
      while (i + 3 < b.length) {
        if (b(i) != 0xff.toByte) return null // desynchronized stream
        // skip fill bytes (padding FFs before a marker)
        var j = i + 1
        while (j < b.length && b(j) == 0xff.toByte) j += 1
        // marker byte + 2 length bytes must all be readable
        if (j + 2 >= b.length) return null
        val m = b(j) & 0xff
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i = j + 1 // standalone marker, no length field
        } else if (m == 0xd9 || m == 0xda) {
          return null // EOI / start-of-scan reached without a frame header
        } else {
          val len = be16(b, j + 1)
          if (len < 2) return null
          // SOFn frame headers: C0-CF except DHT(C4), JPG(C8), DAC(CC)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (j + 8 >= b.length || len < 7) return null
            val h = be16(b, j + 4) // after 2 length bytes + 1 precision byte
            val w = be16(b, j + 6)
            if (w > 0 && h > 0) return ("jpeg", w, h) else return null
          }
          i = j + 1 + len
        }
      }
      null
    } else null
  }

  /** Catalyst-row variant for the codegen path (null = unrecognized). */
  def parseRow(b: Array[Byte]): InternalRow = {
    val p = parse(b)
    if (p == null) null
    else new GenericInternalRow(Array[Any](UTF8String.fromString(p._1), p._2, p._3))
  }
}

/** `image_meta(binary)` → `struct<format:string, width:int, height:int>`,
  * null when the payload is not a recognized image container. The generated
  * code is a single static call, so the projection stays inside whole-stage
  * codegen (same pattern as Catalyst's own `StaticInvoke`).
  */
case class ImageMeta(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else ImageHeader.parseRow(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val rowCls = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $rowCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.ImageHeader.parseRow(${childGen.value});
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ImageMeta =
    copy(child = newChild)
}

object ImageMeta {
  /** Column wrapper. */
  def apply(payload: Column): Column =
    ColumnBridge.column(ImageMeta(ColumnBridge.expression(payload)))
}
