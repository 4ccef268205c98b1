package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for INCREMENTAL SCD2 MAINTENANCE: the declared
  * `q_scd2` builds the type-2 dimension from the event log in batch; a
  * streaming ingest maintains the same version history online — each
  * arriving event either extends the current version (same type) or
  * opens a new one — so the dimension is queryable while the log is
  * still landing. This smoke proves the incrementally-built history
  * equals the batch build row for row.
  *
  *  - batch: the declared q_scd2 at sf0.001, reassembled per user as
  *    (version, event_type, valid_from_ms) triples;
  *  - streaming: events replayed through [[KeyFlowTws]] keyed by USER in
  *    (ms, event_id) order (offset = position in that order, so the
  *    per-key offset sequence IS the SCD2 ordering), folding the ordered
  *    version list across 4 microbatches with a replay overlap — the
  *    change-detection fold is idempotent under re-delivery only because
  *    the engine's offset guard drops replayed records BEFORE the fold
  *    (an appended duplicate "change" would corrupt the history, which
  *    is exactly why the P9 guard exists).
  *
  * Exits 0 iff every user's version history matches. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object Scd2ParitySmoke {
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

    // ---- batch truth: the declared q_scd2 history per user
    val batch: Map[String, List[(Long, String, Long)]] =
      graft.SparkEntry.queries("q_scd2")(spark, dir)
        .select("user_id", "version", "event_type", "valid_from_ms")
        .collect()
        .map(r => (r.getLong(0).toString, (r.getLong(1), r.getString(2), r.getLong(3))))
        .groupBy(_._1)
        .map { case (u, xs) => u -> xs.map(_._2).toList.sortBy(_._1) }

    // ---- streaming: offset = position in the global (ms, event_id)
    // order, so per-key offsets replay in exactly the SCD2 ordering
    val feed = Tables(spark, dir, "events")
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

    // version-history fold: append on type change only
    val step: (List[(Long, String, Long)], Record) => List[(Long, String, Long)] = {
      (hist, r) =>
        val Array(tpe, ms) = new String(r.value, "UTF-8").split('|')
        hist.lastOption match {
          case Some((_, last, _)) if last == tpe => hist
          case _ => hist :+ ((hist.size + 1L, tpe, ms.toLong))
        }
    }
    val fold = FoldOption.of[List[(Long, String, Long)], Record](
      r => step(Nil, r))(step)

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("scd2parity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("scd2parity").toString)
      .start()
    // 4 microbatches; batch 2 re-sends the tail of batch 1 — the offset
    // guard must drop the replays or histories grow phantom versions
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(40) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, List[(Long, String, Long)]] =
      spark.table("scd2parity").as[KeyOutput[List[(Long, String, Long)]]]
        .collect().groupBy(_.key).toSeq
        .map { case (u, rows) => u -> rows.maxBy(_.offset).state.get }
        .toMap
    q.stop()

    val ok = streamed == batch
    if (!ok) {
      (streamed.keySet ++ batch.keySet).toSeq.sorted
        .filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
          println(s"MISMATCH user=$k stream=${streamed.get(k)} batch=${batch.get(k)}")
        }
      println(s"users stream=${streamed.size} batch=${batch.size}")
    }
    spark.stop()
    println(s"SCD2_PARITY_OK=$ok (${batch.size} users, " +
      s"${batch.valuesIterator.map(_.size).sum} versions)")
    sys.exit(if (ok) 0 else 1)
  }
}
