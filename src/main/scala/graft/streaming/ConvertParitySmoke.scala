package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for INCREMENTAL CONVERSION TRACKING: the declared
  * `q_time_to_convert` derives each user's first-view → first-purchase
  * latency in batch; a streaming ingest maintains the same per-user
  * (first view ms, first purchase ms) state online, so conversion
  * dashboards see a purchase the microbatch it lands instead of waiting
  * for the nightly scan. This smoke proves the online state equals the
  * batch grain user for user.
  *
  *  - batch: the same two conditional MINs `q_time_to_convert` reduces to,
  *    collected per user;
  *  - streaming: view/purchase events replayed through [[KeyFlowTws]]
  *    keyed by user across 4 microbatches with a replay overlap — the
  *    min-fold is idempotent, so this also documents that P9 offset
  *    dedup is a SAFETY property here, not a correctness crutch;
  *  - the converted-user count must equal Σ n_users of the declared
  *    decile output (ties the online state to the declared query).
  *
  * Exits 0 iff every user's pair matches and the counts agree. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object ConvertParitySmoke {
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

    // ---- batch truth: the per-user grain q_time_to_convert reduces to
    val batch: Map[String, (Long, Long)] =
      Tables(spark, dir, "events")
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", expr("ts div 1000000"))).as("v_ms"),
          min(when(col("event_type") === "purchase", expr("ts div 1000000"))).as("p_ms"))
        .collect()
        .map { r =>
          def g(i: Int): Long = if (r.isNullAt(i)) -1L else r.getLong(i)
          r.getLong(0).toString -> ((g(1), g(2)))
        }.toMap

    // ---- streaming: the same events in (ms, event_id) arrival order
    val feed = Tables(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000").as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy { case (_, id, _, ms) => (ms, id) }
      .zipWithIndex
      .map { case ((user, _, tpe, ms), seq) =>
        Record("events", 0, seq.toLong, new Timestamp(0L), 0, user.toString,
          s"$tpe|$ms".getBytes("UTF-8"), Map.empty)
      }

    // (first view ms, first purchase ms) with -1 = not seen
    val step: ((Long, Long), Record) => (Long, Long) = { (st, r) =>
      val Array(tpe, msStr) = new String(r.value, "UTF-8").split('|')
      val ms = msStr.toLong
      def mn(cur: Long): Long = if (cur < 0 || ms < cur) ms else cur
      if (tpe == "view") (mn(st._1), st._2) else (st._1, mn(st._2))
    }
    val fold = FoldOption.of[(Long, Long), Record](
      r => step((-1L, -1L), r))(step)

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("convparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("convparity").toString)
      .start()
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(25) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, (Long, Long)] =
      spark.table("convparity").as[KeyOutput[(Long, Long)]]
        .collect().groupBy(_.key).toSeq
        .map { case (u, rows) => u -> rows.maxBy(_.offset).state.get }
        .toMap
    q.stop()

    val stateOk = streamed == batch
    val streamConverted = streamed.valuesIterator
      .count { case (v, p) => v >= 0 && p >= 0 && p > v }
    val declaredConverted = graft.SparkEntry.queries("q_time_to_convert")(spark, dir)
      .agg(coalesce(sum("n_users"), lit(0L))).collect()(0).getLong(0)
    val countOk = streamConverted.toLong == declaredConverted
    if (!stateOk) {
      (streamed.keySet ++ batch.keySet).toSeq.sorted
        .filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
          println(s"MISMATCH user=$k stream=${streamed.get(k)} batch=${batch.get(k)}")
        }
      println(s"users stream=${streamed.size} batch=${batch.size}")
    }
    if (!countOk)
      println(s"COUNT MISMATCH stream=$streamConverted declared=$declaredConverted")
    spark.stop()
    val ok = stateOk && countOk
    println(s"CONVERT_PARITY_OK=$ok (${batch.size} users, $streamConverted converted)")
    sys.exit(if (ok) 0 else 1)
  }
}
