package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, plus a decode/feature-extract stage with the real Spark-side
  * plumbing (schema, partition-preserving batched iteration). The decode
  * itself is two-tier: recognized image containers (PNG/JPEG/GIF/BMP) get
  * REAL header-only metadata via `graft.functions.ImageHeader` — pure byte
  * arithmetic, no codec needed — and everything else falls back to
  * `decodeStub`, the documented stand-in for a pixel/audio codec that is
  * not available in this environment. Swap `decodeStub` for a real decoder
  * (JNI/FFI) without touching the plumbing.
  */
object Multimodal {

  /** Typed metadata of a decoded media payload. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Attach an opaque binary payload column (here: utf-8 bytes standing in
    * for encoded media) plus cheap columnar metadata that never requires
    * decoding: size, digest, deterministic shape fields. */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = col(textCol).cast("binary")
    docs.select(
      col(idCol),
      payload.as("payload"),
      octet_length(payload).cast("long").as("n_bytes"),
      md5(payload).as("digest"))
  }

  /** ======= STUB ======= deterministic fake decode: real systems replace
    * this body with an image/audio codec call; everything around it (batch
    * iteration, output schema, partitioning) is production-shaped. */
  private def decodeStub(docId: Long, bytes: Array[Byte],
      md: java.security.MessageDigest): MediaFeatures = {
    val n = bytes.length.toLong
    val digest = md.digest(bytes).map("%02x".format(_)).mkString
    MediaFeatures(
      doc_id = docId,
      n_bytes = n,
      digest = digest,
      width = (64 + n % 960).toInt,
      height = (64 + (n * 7919) % 704).toInt,
      n_frames = (1 + n / 256).toInt)
  }

  /** Decode/feature-extract over partition-local batches (the Scala
    * analogue of a vectorized decode: one iterator pass per partition, no
    * shuffle, bounded memory). Recognized image containers are parsed for
    * real (header bytes only — the cheap route/reject stage that precedes
    * any pixel decode at scale); unrecognized payloads fall back to the
    * stub. */
  def decodeFeatures(payloads: DataFrame, idCol: String)(
      implicit enc: Encoder[MediaFeatures]): Dataset[MediaFeatures] = {
    val idIdx = payloads.schema.fieldIndex(idCol)
    val payloadIdx = payloads.schema.fieldIndex("payload")
    payloads.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5") // one per partition
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val img = graft.functions.ImageHeader.parse(bytes)
        if (img != null) {
          val digest = md.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length.toLong, digest, img._2, img._3, 1)
        } else decodeStub(id, bytes, md)
      }
    }
  }

  /** Frame sampling plan for video-like payloads: every `stride`-th frame,
    * computed columnar from metadata only (no decode). */
  def sampleFramePlan(features: DataFrame, stride: Int): DataFrame =
    features.select(
      col("doc_id"),
      sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(stride)).as("frame_ids"))
      .withColumn("n_sampled", size(col("frame_ids")).cast("long"))
}
