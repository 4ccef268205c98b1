package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Truth table for the ISO-BMFF box walk: hand-built boxes per the public
  * layout (version 0 and 1 mvhd/tkhd, 64-bit largesize, unknown boxes,
  * truncation), via the static parser and a DataFrame projection.
  */
class VideoMetaSpec extends SparkTestBase {

  private def be16(x: Int): Array[Byte] = Array((x >> 8).toByte, x.toByte)
  private def be32(x: Long): Array[Byte] =
    Array((x >> 24).toByte, (x >> 16).toByte, (x >> 8).toByte, x.toByte)
  private def be64(x: Long): Array[Byte] = be32(x >> 32) ++ be32(x & 0xffffffffL)

  private def box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tp.getBytes ++ payload

  /** largesize variant: 32-bit size == 1, 64-bit size after the type. */
  private def largeBox(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ tp.getBytes ++ be64(payload.length + 16L) ++ payload

  private val unityMatrix: Array[Byte] =
    be32(0x10000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x10000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L)

  private def ftyp(brand: String): Array[Byte] = box("ftyp", brand.getBytes ++ be32(0))

  private def mvhd(v: Int, timescale: Long, duration: Long): Array[Byte] = {
    val vf = Array(v.toByte, 0.toByte, 0.toByte, 0.toByte)
    val times =
      if (v == 1) be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration)
      else be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration)
    val tail = be32(0x10000L) ++ be16(0x0100) ++ be16(0) ++ be64(0) ++
      unityMatrix ++ new Array[Byte](24) ++ be32(2)
    box("mvhd", vf ++ times ++ tail)
  }

  private def tkhd(v: Int, w: Int, h: Int): Array[Byte] = {
    val vf = Array(v.toByte, 0.toByte, 0.toByte, 3.toByte)
    val times =
      if (v == 1) be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++ be64(0)
      else be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(0)
    val tail = be64(0) ++ be16(0) ++ be16(0) ++ be16(0) ++ be16(0) ++
      unityMatrix ++ be32(w.toLong << 16) ++ be32(h.toLong << 16)
    box("tkhd", vf ++ times ++ tail)
  }

  private def mp4(v: Int, w: Int, h: Int, timescale: Long, duration: Long,
      brand: String = "isom"): Array[Byte] =
    ftyp(brand) ++ box("moov", mvhd(v, timescale, duration) ++ box("trak", tkhd(v, w, h)))

  test("parse: v0 and v1 layouts, brand, fixed-point dims, duration") {
    assert(VideoHeader.parse(mp4(0, 1920, 1080, 1000, 90000)) ==
      ("isom", 1920, 1080, 90000L))
    assert(VideoHeader.parse(mp4(1, 640, 360, 600, 1234, brand = "mp42")) ==
      ("mp42", 640, 360, 1234L * 1000 / 600))
  }

  test("parse: skips unknown boxes, largesize, audio-first track") {
    // free box before moov; audio track (0x0 dims) before the video track
    val b = ftyp("isom") ++ box("free", new Array[Byte](12)) ++
      box("moov", mvhd(0, 1000, 5000) ++
        box("trak", tkhd(0, 0, 0)) ++ // audio: zero dims, must be skipped
        box("udta", "xx".getBytes) ++
        box("trak", tkhd(1, 320, 240)))
    assert(VideoHeader.parse(b) == ("isom", 320, 240, 5000L))
    val large = ftyp("isom") ++ largeBox("moov",
      mvhd(0, 1000, 7000) ++ box("trak", tkhd(0, 12, 34)))
    assert(VideoHeader.parse(large) == ("isom", 12, 34, 7000L))
  }

  test("parse: rejects garbage, truncation, missing pieces") {
    assert(VideoHeader.parse(null) == null)
    assert(VideoHeader.parse("random text that is not a container".getBytes) == null)
    assert(VideoHeader.parse(mp4(0, 640, 480, 1000, 9000).take(40)) == null) // cut in moov
    assert(VideoHeader.parse(ftyp("isom")) == null) // no moov
    assert(VideoHeader.parse(
      ftyp("isom") ++ box("moov", box("trak", tkhd(0, 1, 1)))) == null) // no mvhd
    assert(VideoHeader.parse(mp4(0, 640, 480, 0, 9000)) == null) // zero timescale
    // empty (size-8) mvhd box ending at the buffer end (regression: this
    // threw on the version-byte read instead of returning null)
    assert(VideoHeader.parse(ftyp("isom") ++ box("mvhd", Array.emptyByteArray)) == null)
  }

  test("VideoMeta column matches the static parser through codegen") {
    import spark.implicits._
    val rows = Seq(
      (1L, mp4(0, 1280, 720, 1000, 60000)),
      (2L, "nope".getBytes))
    val out = rows.toDF("id", "payload")
      .select(col("id"), VideoMeta(col("payload")).as("m"))
      .select(col("id"), col("m.brand"), col("m.width"), col("m.height"), col("m.duration_ms"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ("isom", 1280, 720, 60000L))
    assert(out(2L) == null)
  }
}
