package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Truth table for the kafka-journal wire decode (reference
  * JournalParserSpec.scala:18-79: correct JSON parses, bad payloads
  * surface, non-append records yield nothing). */
class JournalParserSpec extends SparkTestBase {

  private val appendHeader =
    """{"append":{"range":{"from":21398,"to":21399},"payloadType":"json"}}"""
  private val envelope =
    """{"events":[
      |{"seqNr":21398,"tags":[],"payload":{"payload":{"field1":"value1","field2":7}}},
      |{"seqNr":21399,"tags":["t"],"payload":{"payload":{"field1":"value2","field2":8}}}
      |]}""".stripMargin

  private def df(rows: (String, String, Map[String, String])*) = {
    import spark.implicits._
    rows.toDF("key", "value", "headers")
  }

  private val payloadSchema =
    new StructType().add("field1", StringType).add("field2", LongType)

  test("append record decodes seq range from headers and typed events from the value") {
    val in = df(("id", envelope, Map(JournalParser.ActionHeaderKey -> appendHeader)))
    val ranged = JournalParser.withSeqRange(in)
      .select("seq_from", "seq_to", "payload_type").head()
    assert(ranged.getLong(0) == 21398L && ranged.getLong(1) == 21399L &&
      ranged.getString(2) == "json")
    val events = JournalParser.toEvents(in, payloadSchema)
      .select(col("seq_nr"), col("payload.field1"), col("payload.field2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(events == List((21398L, "value1", 7L), (21399L, "value2", 8L)))
  }

  test("non-append and non-json records yield no events; seq range is null") {
    val in = df(
      ("id1", envelope, Map("other.header" -> "x")), // no action header
      ("id2", envelope, Map(JournalParser.ActionHeaderKey ->
        """{"append":{"range":{"from":1,"to":1},"payloadType":"binary"}}""")),
      ("id3", envelope, Map.empty[String, String]))
    assert(JournalParser.toEvents(in, payloadSchema).count() == 0)
    val r = JournalParser.withSeqRange(in).filter(col("key") === "id1").head()
    assert(r.isNullAt(r.fieldIndex("seq_from")))
  }

  test("malformed JSON drops in permissive mode and throws in strict mode") {
    val in = df(("id", """{"events": not-json""",
      Map(JournalParser.ActionHeaderKey -> appendHeader)))
    assert(JournalParser.toEvents(in, payloadSchema).count() == 0)
    val ex = intercept[Exception] {
      JournalParser.toEvents(in, payloadSchema, strict = true).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
