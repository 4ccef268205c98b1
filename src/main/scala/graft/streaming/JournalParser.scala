package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoder for the kafka-journal wire format ≅ reference `JournalParser`
  * (kafka-journal/.../JournalParser.scala:16-90), re-expressed as
  * `from_json` Column transforms so the decode is part of the codegen'd
  * scan stage — no per-row user code, column pruning reaches the source.
  *
  * Wire format (kafka-journal public format):
  *  - record header `journal.action`: JSON ActionHeader; append actions
  *    carry `{"append":{"range":{"from":N,"to":M},"payloadType":"json"}}`
  *  - record value: JSON envelope
  *    `{"events":[{"seqNr":N,"tags":[...],"payload":{"payload":<user>}}]}`
  *
  * API mapping: `toSeqRange` → [[withSeqRange]] (headers only — the value
  * is never parsed, matching the reference's fast path); `toPayloads` /
  * `toEvents` → [[toEvents]] with the payload schema you expect (pass the
  * full payload struct to get `toPayloads` behavior, a narrower struct for
  * typed `toEvents`).
  */
object JournalParser {

  /** Header key carrying the action descriptor (kafka-journal's
    * `ActionHeader.key`). */
  val ActionHeaderKey = "journal.action"

  private val actionHeaderSchema: StructType =
    new StructType().add("append",
      new StructType()
        .add("range", new StructType().add("from", LongType).add("to", LongType))
        .add("payloadType", StringType))

  private def envelopeSchema(payloadSchema: DataType): StructType =
    new StructType().add("events", ArrayType(
      new StructType()
        .add("seqNr", LongType)
        .add("tags", ArrayType(StringType))
        .add("payload", new StructType().add("payload", payloadSchema))))

  /** Header-only decode (no payload parse): adds `seq_from`/`seq_to` and
    * `payload_type`; null for records that are not journal appends. */
  def withSeqRange(records: DataFrame): DataFrame =
    records
      .withColumn("__ah",
        from_json(element_at(col("headers"), ActionHeaderKey), actionHeaderSchema))
      .withColumn("seq_from", col("__ah.append.range.from"))
      .withColumn("seq_to", col("__ah.append.range.to"))
      .withColumn("payload_type", col("__ah.append.payloadType"))
      .drop("__ah")

  /** One row per journal event: the input's identifying columns plus
    * `seq_nr` and `payload` (struct of `payloadSchema`). Non-append records
    * and non-JSON payload types are dropped (the reference surfaces them as
    * decode failures; a relational pipeline filters). With `strict = true`
    * malformed JSON throws (FAILFAST) instead of dropping. */
  def toEvents(
      records: DataFrame,
      payloadSchema: DataType,
      strict: Boolean = false): DataFrame = {
    val options = if (strict) Map("mode" -> "FAILFAST") else Map.empty[String, String]
    withSeqRange(records)
      .filter(col("seq_from").isNotNull && col("payload_type") === "json")
      .withColumn("__env",
        from_json(col("value").cast("string"), envelopeSchema(payloadSchema), options))
      .withColumn("__e", explode(col("__env.events")))
      .withColumn("seq_nr", col("__e.seqNr"))
      .withColumn("payload", col("__e.payload.payload"))
      .drop("__env", "__e")
  }
}
