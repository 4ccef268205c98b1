package graft.streaming

import graft.Tables
import graft.model.Record
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import java.sql.Timestamp

/** The transformWithState LIST-state surface — the per-key ordered event
  * BUFFER (reference `Journals` P6: per-key event list, appended in offset
  * order, flushed in order). Each user's event types append to a
  * ListState across 4 microbatches; at the end the reassembled sequence
  * must equal the batch `string_agg(event_type ORDER BY event_id)` — the
  * q_fold_ordered claim, carried by the store's list ordering instead of
  * a fold accumulator. Exits 0 iff every user's sequence matches. Forked
  * by StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object ListStateSmoke {

  final case class SeqOut(key: String, seq: String)

  class JournalBufferProcessor
    extends StatefulProcessor[String, Record, SeqOut] {

    @transient private var buf: ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[String]("journal", Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[Record],
        timerValues: TimerValues): Iterator[SeqOut] = {
      // rows within a batch arrive unordered — sort by offset before the
      // append (the engine's offset-order discipline); batches arrive in
      // stream order so the list stays globally ordered per key
      rows.toArray.sortBy(_.offset)
        .foreach(r => buf.appendValue(new String(r.value, "UTF-8")))
      Iterator.single(SeqOut(key, buf.get().mkString(",")))
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
      .transformWithState(new JournalBufferProcessor, TimeMode.None(), OutputMode.Update())
    val q = out.writeStream.format("memory").queryName("liststate")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("liststate").toString)
      .start()
    events.grouped(math.max(events.length / 4, 1)).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    // longest emitted sequence per user = final buffer content
    val streamed = spark.table("liststate").as[SeqOut]
      .collect().groupBy(_.key)
      .map { case (k, rows) => k -> rows.map(_.seq).maxBy(_.length) }
    q.stop()

    // batch truth straight off the (already offset-sorted) event array —
    // the q_fold_ordered oracle shape (string_agg ORDER BY event_id)
    val batch = events.groupBy(_.key)
      .map { case (k, rs) => k -> rs.map(r => new String(r.value, "UTF-8")).mkString(",") }

    val ok = streamed == batch
    if (!ok) {
      val ks = (streamed.keySet ++ batch.keySet).toSeq.sorted
      ks.filter(k => streamed.get(k) != batch.get(k)).take(3).foreach { k =>
        println(s"MISMATCH user=$k stream=${streamed.get(k).map(_.take(80))} " +
          s"batch=${batch.get(k).map(_.take(80))}")
      }
    }
    spark.stop()
    println(s"LISTSTATE_OK=$ok (${batch.size} users)")
    sys.exit(if (ok) 0 else 1)
  }
}
