package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Truth table for the header-only image parser: hand-built byte fixtures
  * per container format (the public magic-byte layouts), exercised both via
  * the static parser and through a DataFrame projection (whole-stage
  * codegen path).
  */
class ImageMetaSpec extends SparkTestBase {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  private def png(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      bytes(0, 0, 0, 13) ++ "IHDR".getBytes ++
      bytes(w >>> 24, w >>> 16, w >>> 8, w) ++
      bytes(h >>> 24, h >>> 16, h >>> 8, h) ++
      bytes(8, 6, 0, 0, 0) // bit depth, color type, compression, filter, interlace

  private def gif(w: Int, h: Int, version: Char = '9'): Array[Byte] =
    s"GIF8${version}a".getBytes ++ bytes(w, w >>> 8, h, h >>> 8) ++ bytes(0xf7, 0, 0)

  private def bmp(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ new Array[Byte](12) ++
      bytes(40, 0, 0, 0) ++ // BITMAPINFOHEADER size field
      bytes(w, w >>> 8, w >>> 16, w >>> 24) ++
      bytes(h, h >>> 8, h >>> 16, h >>> 24) ++ bytes(1, 0)

  private def bmpCore(w: Int, h: Int): Array[Byte] =
    "BM".getBytes ++ new Array[Byte](12) ++
      bytes(12, 0, 0, 0) ++ // BITMAPCOREHEADER: 16-bit dims
      bytes(w, w >>> 8) ++ bytes(h, h >>> 8) ++ bytes(1, 0, 24, 0) ++
      new Array[Byte](4)

  private def segment(marker: Int, payload: Array[Byte]): Array[Byte] = {
    val len = payload.length + 2
    bytes(0xff, marker, len >>> 8, len) ++ payload
  }

  private def sof(w: Int, h: Int): Array[Byte] =
    bytes(8, h >>> 8, h, w >>> 8, w, 1, 0x01, 0x11, 0x00) // precision, h, w, 1 component

  /** SOI + APP0(JFIF) + a DQT whose payload contains 0xFF bytes + SOF0. */
  private def jpeg(w: Int, h: Int, sofMarker: Int = 0xc0): Array[Byte] =
    bytes(0xff, 0xd8) ++
      segment(0xe0, "JFIF".getBytes ++ bytes(0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      segment(0xdb, bytes(0) ++ Array.fill(64)(0xff.toByte)) ++
      segment(sofMarker, sof(w, h))

  test("parse: PNG / GIF87a / GIF89a / BMP / JPEG dimensions") {
    assert(ImageHeader.parse(png(640, 480)) == ("png", 640, 480))
    assert(ImageHeader.parse(png(70000, 3)) == ("png", 70000, 3)) // >16-bit width
    assert(ImageHeader.parse(gif(320, 200, '7')) == ("gif", 320, 200))
    assert(ImageHeader.parse(gif(65535, 1)) == ("gif", 65535, 1))
    assert(ImageHeader.parse(bmp(1024, 768)) == ("bmp", 1024, 768))
    assert(ImageHeader.parse(bmpCore(320, 200)) == ("bmp", 320, 200))
    // OS/2 2.x BITMAPCOREHEADER2: any declared size 16..64 shares the
    // 32-bit dims at 18/22
    val os2 = bmp(64, 48); os2(14) = 16
    assert(ImageHeader.parse(os2) == ("bmp", 64, 48))
    assert(ImageHeader.parse(jpeg(1920, 1080)) == ("jpeg", 1920, 1080))
  }

  test("parse: JPEG walks past APP/DQT segments with 0xFF payload bytes; SOF2 counts") {
    assert(ImageHeader.parse(jpeg(33, 44, sofMarker = 0xc2)) == ("jpeg", 33, 44))
    // DHT (C4) must NOT be taken as a frame header
    val withDht = bytes(0xff, 0xd8) ++ segment(0xc4, bytes(0, 1, 2, 3, 4, 5, 6, 7)) ++
      segment(0xc0, sof(10, 20))
    assert(ImageHeader.parse(withDht) == ("jpeg", 10, 20))
  }

  test("parse: BMP top-down (negative height) reports magnitude") {
    val b = bmp(6, 9)
    val neg = -9
    b(22) = neg.toByte; b(23) = (neg >> 8).toByte
    b(24) = (neg >> 16).toByte; b(25) = (neg >> 24).toByte
    assert(ImageHeader.parse(b) == ("bmp", 6, 9))
  }

  test("parse: rejects garbage, truncation, and image-less JPEG streams") {
    assert(ImageHeader.parse(null) == null)
    assert(ImageHeader.parse(Array.emptyByteArray) == null)
    assert(ImageHeader.parse("plain text document".getBytes) == null)
    assert(ImageHeader.parse(png(5, 5).take(8)) == null)   // magic only
    assert(ImageHeader.parse(png(5, 5).take(18)) == null)  // IHDR cut mid-width
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0xff, 0xd9)) == null) // SOI+EOI, no frame
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0x00, 0x11)) == null) // desync
    assert(ImageHeader.parse(gif(0, 10)) == null)          // zero dimension
    // segment cut between the fill byte and its length field (regression:
    // this threw instead of returning null)
    assert(ImageHeader.parse(bytes(0xff, 0xd8, 0xff, 0xff, 0xe0, 0x00)) == null)
    // unknown DIB header size: never trust BITMAPINFOHEADER offsets
    val weirdDib = "BM".getBytes ++ new Array[Byte](12) ++
      bytes(99, 0, 0, 0) ++ new Array[Byte](12)
    assert(ImageHeader.parse(weirdDib) == null)
    // sizes inside the old permissive 16..124 range but not real DIB
    // layouts (70, 20) must also be rejected — whitelist, not range
    for (sz <- Seq(20, 70)) {
      val b = bmp(64, 48); b(14) = sz.toByte
      assert(ImageHeader.parse(b) == null, s"dib=$sz")
    }
  }

  test("ImageMeta column matches the static parser through codegen") {
    import spark.implicits._
    val rows = Seq(
      (1L, png(800, 600)), (2L, gif(12, 34)), (3L, bmp(56, 78)),
      (4L, jpeg(111, 222)), (5L, "not an image".getBytes))
    val out = rows.toDF("id", "payload")
      .select(col("id"), ImageMeta(col("payload")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out(1L) == ("png", 800, 600))
    assert(out(2L) == ("gif", 12, 34))
    assert(out(3L) == ("bmp", 56, 78))
    assert(out(4L) == ("jpeg", 111, 222))
    assert(out(5L) == null)
  }
}
