package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Truth table for the RIFF/WAVE chunk-walk parser: hand-built headers per
  * the public container layout, exercised via the static parser and through
  * a DataFrame projection (codegen path).
  */
class AudioMetaSpec extends SparkTestBase {

  private def le16(x: Int): Array[Byte] = Array(x.toByte, (x >> 8).toByte)
  private def le32(x: Long): Array[Byte] =
    Array(x.toByte, (x >> 8).toByte, (x >> 16).toByte, (x >> 24).toByte)

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes ++ le32(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)

  private def fmt(tag: Int, ch: Int, rate: Int, bits: Int): Array[Byte] = {
    val byteRate = rate.toLong * ch * (bits / 8)
    le16(tag) ++ le16(ch) ++ le32(rate.toLong) ++ le32(byteRate) ++
      le16(ch * (bits / 8)) ++ le16(bits)
  }

  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = "WAVE".getBytes ++ chunks.flatten
    "RIFF".getBytes ++ le32(body.length.toLong) ++ body
  }

  /** data chunk with a real (possibly empty) payload. */
  private def data(n: Int): Array[Byte] = chunk("data", new Array[Byte](n))
  /** header-only data chunk: declared size, payload not materialized. */
  private def dataDeclared(n: Long): Array[Byte] = "data".getBytes ++ le32(n)

  test("parse: canonical PCM, stereo, duration from byte rate") {
    // 44.1 kHz stereo 16-bit, 1 s of samples = 176400 bytes
    val b = wav(chunk("fmt ", fmt(1, 2, 44100, 16)), dataDeclared(176400L))
    assert(AudioHeader.parse(b) == ("pcm", 2, 44100, 16, 1000L))
    val half = wav(chunk("fmt ", fmt(3, 1, 8000, 32)), dataDeclared(16000L))
    assert(AudioHeader.parse(half) == ("float", 1, 8000, 32, 500L))
  }

  test("parse: skips unknown chunks, handles odd sizes and either order") {
    val listInfo = chunk("LIST", "INFOx".getBytes) // odd payload → pad byte
    val b = wav(listInfo, chunk("fact", le32(123L)), chunk("fmt ", fmt(1, 1, 16000, 8)),
      dataDeclared(16000L))
    assert(AudioHeader.parse(b) == ("pcm", 1, 16000, 8, 1000L))
    // data (materialized) BEFORE fmt — walk must continue past it
    val swapped = wav(data(3200), chunk("fmt ", fmt(1, 1, 16000, 16)))
    assert(AudioHeader.parse(swapped) == ("pcm", 1, 16000, 16, 100L))
  }

  test("parse: rejects garbage, truncation, and zeroed fmt fields") {
    assert(AudioHeader.parse(null) == null)
    assert(AudioHeader.parse("RIFFxxxxAVI LIST".getBytes) == null) // not WAVE
    assert(AudioHeader.parse("not audio at all".getBytes) == null)
    assert(AudioHeader.parse(wav(chunk("fmt ", fmt(1, 2, 44100, 16)))) == null) // no data
    assert(AudioHeader.parse(wav(dataDeclared(100L))) == null) // no fmt
    val cut = wav(chunk("fmt ", fmt(1, 2, 44100, 16)), dataDeclared(176400L)).take(24)
    assert(AudioHeader.parse(cut) == null) // fmt truncated mid-block
    assert(AudioHeader.parse(wav(chunk("fmt ", fmt(1, 0, 44100, 16)),
      dataDeclared(10L))) == null) // zero channels
    // bogus 4 GiB declared chunk size must not wrap the cursor (terminates)
    val bogus = wav(("junk".getBytes ++ le32(0xfffffff0L)) ++ new Array[Byte](4),
      chunk("fmt ", fmt(1, 1, 8000, 8)), dataDeclared(8000L))
    assert(AudioHeader.parse(bogus) == null) // walk ends inside the bogus chunk
  }

  test("AudioMeta column matches the static parser through codegen") {
    import spark.implicits._
    val rows = Seq(
      (1L, wav(chunk("fmt ", fmt(1, 2, 48000, 16)), dataDeclared(192000L))),
      (2L, "definitely not a wav".getBytes))
    val out = rows.toDF("id", "payload")
      .select(col("id"), AudioMeta(col("payload")).as("m"))
      .select(col("id"), col("m.codec"), col("m.channels"), col("m.sample_rate"),
        col("m.bits"), col("m.duration_ms"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null
         else (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))))
      .toMap
    assert(out(1L) == ("pcm", 2, 48000, 16, 1000L))
    assert(out(2L) == null)
  }
}
