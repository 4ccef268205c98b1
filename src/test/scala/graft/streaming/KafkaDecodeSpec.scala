package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Kafka-source decode without a broker: a hand-built DataFrame with the
  * exact Kafka source schema goes through the same projection `fromKafka`
  * uses. */
class KafkaDecodeSpec extends SparkTestBase {

  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  test("decodeKafka maps the source row to the Record envelope") {
    val rows = java.util.Arrays.asList(
      Row("k1".getBytes, "payload".getBytes, "t", 3, 42L, new Timestamp(1000L), 0,
        Seq(Row("h1", "v1".getBytes), Row("h2", "v2".getBytes))),
      Row(null, null, "t", 3, 43L, new Timestamp(2000L), 0, null))
    val df = spark.createDataFrame(rows, kafkaSchema)
    val out = KafkaFlowSpark.decodeKafka(df).collect().sortBy(_.offset)

    val r1 = out(0)
    assert(r1.key == "k1" && r1.topic == "t" && r1.partition == 3 && r1.offset == 42L)
    assert(new String(r1.value) == "payload")
    assert(r1.headers == Map("h1" -> "v1", "h2" -> "v2"))

    val r2 = out(1)
    assert(r2.key == null && r2.value == null && r2.headers == Map.empty)
  }
}
