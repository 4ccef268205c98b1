package graft.streaming

import graft.Tables
import graft.model.Record
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import java.sql.Timestamp

/** The transformWithState MAP-state surface — per-key SUB-KEYED state
  * (reference users build this shape by hand inside their fold `S`; TWS
  * exposes it natively as `getMapState`, with per-entry updates instead
  * of rewriting a whole composite value). The smoke maintains per-user
  * per-event-type counters in a MapState across 4 microbatches and
  * diffs the final ledger against the batch (user, type) aggregate.
  * Exits 0 iff every (user, type) count matches. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object MapStateSmoke {

  final case class TypeCount(key: String, event_type: String, n: Long)

  class TypeCountsProcessor
    extends StatefulProcessor[String, Record, TypeCount] {

    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "byType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Record],
        timerValues: TimerValues): Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { r =>
        val t = new String(r.value, "UTF-8")
        val prev = if (counts.containsKey(t)) counts.getValue(t) else 0L
        counts.updateValue(t, prev + 1L)
        touched += t
      }
      touched.iterator.map(t => TypeCount(key, t, counts.getValue(t)))
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val events = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type")).collect()
      .map(r => Record("events", 0, r.getLong(0), new Timestamp(0L), 0,
        r.getLong(1).toString, r.getString(2).getBytes("UTF-8"), Map.empty))
      .sortBy(_.offset)

    val input = MemoryStream[Record]
    val out = input.toDS()
      .groupByKey(_.key)
      .transformWithState(new TypeCountsProcessor, TimeMode.None(), OutputMode.Update())
    val q = out.writeStream.format("memory").queryName("mapstate")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mapstate").toString)
      .start()
    events.grouped(math.max(events.length / 4, 1)).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    // last emitted count per (user, type) wins (running counters)
    val streamed = spark.table("mapstate").as[TypeCount]
      .collect().groupBy(tc => (tc.key, tc.event_type))
      .map { case (k, rows) => k -> rows.map(_.n).max }
    q.stop()

    val batch = Tables(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0).toString, r.getString(1)) -> r.getLong(2)).toMap

    val ok = streamed == batch
    if (!ok) {
      val ks = (streamed.keySet ++ batch.keySet).toSeq.sorted
      ks.filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
        println(s"MISMATCH $k stream=${streamed.get(k)} batch=${batch.get(k)}")
      }
    }
    spark.stop()
    println(s"MAPSTATE_OK=$ok (${batch.size} (user, type) ledger entries)")
    sys.exit(if (ok) 0 else 1)
  }
}
