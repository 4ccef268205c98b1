package graft.streaming

import graft.Tables
import graft.fold.{FoldOption, TickOption}
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import scala.concurrent.duration._

/** Stream↔batch parity for a TIMER-dependent query (SURVEY §7.5): the
  * q_session_agg semantics — per-user gap-6h sessions with (n_events,
  * start_ms, end_ms) — computed two ways over the real sf0.001 events
  * table, asserted EXACTLY equal:
  *
  *  - batch: `Sessionize.byGap` + groupBy (the declared oracle-backed query);
  *  - streaming: events replayed through [[KeyFlowTws]] in event-time order
  *    across several microbatches, with watermark-domain maxIdle timers
  *    closing a session when the watermark (or a record proving event-time
  *    idleness — retroactive expiry) passes its last event + 6h, WITH a
  *    kill-and-recover from checkpoint halfway through the replay (open
  *    sessions, registered timers, and the watermark must all come back
  *    from state). Sessions are reconstructed from the changelog: a
  *    tombstone at offset o closes the session whose final state row
  *    carries offset o; the max-offset state row past the last tombstone
  *    is the still-open session.
  *
  * Exits 0 iff every user's session list matches. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under the sbt test
  * harness — see TimerSmoke).
  */
object SessionParitySmoke {
  /** foreachBatch changelog collector (driver-local; reconstruction is
    * order-independent — it keys on offsets — so at-least-once replay
    * after the mid-stream restart collapses in the groupBys). */
  val collected = new java.util.concurrent.ConcurrentLinkedQueue[KeyOutput[(Long, Long, Long)]]()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val gapMs = 6L * 3600 * 1000
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // ---- batch truth: the q_session_agg shape
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"))
    val batchSessions: Map[String, Seq[(Long, Long, Long)]] =
      graft.operators.Sessionize.byGap(e, "user_id", "ms", "event_id", gapMs)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n"), min("ms").as("s"), max("ms").as("e"))
        .collect()
        .map(r => (r.getLong(0).toString, (r.getLong(2), r.getLong(3), r.getLong(4))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(t => (t._2, t._3)).toSeq }

    // ---- streaming: replay in event-time order, offset = feed index
    val feed = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._2))
      .zipWithIndex
      .map { case ((u, _, ms), idx) =>
        Record("events", 0, idx.toLong, new Timestamp(ms), 0, u.toString,
          Array[Byte](), Map.empty)
      }
    val fold = FoldOption.of[(Long, Long, Long), Record] { r =>
      val ts = r.timestamp.getTime; (1L, ts, ts)
    } { (st, r) =>
      val ts = r.timestamp.getTime
      (st._1 + 1, math.min(st._2, ts), math.max(st._3, ts))
    }
    val config = KeyFlowConfig(
      maxIdle = Some(gapMs.millis), removeOnIdle = true,
      timerDomain = TimerDomain.Watermark)
    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(
      input.toDS().withWatermark("timestamp", "0 seconds"),
      fold, TickOption.id[(Long, Long, Long)], config)
    // foreachBatch collector (recovery-capable sink — the memory sink
    // refuses checkpoint restart, and this smoke restarts MID-STREAM to
    // prove sessions, timers, and the watermark recover from state)
    val ckpt = java.nio.file.Files.createTempDirectory("sessparity").toString
    def start() = out.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[KeyOutput[(Long, Long, Long)]], _: Long) =>
        b.collect().foreach(SessionParitySmoke.collected.add)
      }
      .start()
    var q = start()

    // several microbatches, split only where event time strictly increases
    // (equal timestamps never straddle a watermark update)
    val nBatches = 8
    var cuts = (1 until nBatches).map(i => feed.length * i / nBatches).map { c0 =>
      var c = c0
      while (c < feed.length && c > 0 &&
        feed(c).timestamp.getTime == feed(c - 1).timestamp.getTime) c += 1
      c
    }.distinct.filter(c => c > 0 && c < feed.length)
    val spans = (Seq(0) ++ cuts ++ Seq(feed.length)).sliding(2).toSeq
    spans.zipWithIndex.foreach { case (Seq(a, b), i) =>
      if (b > a) {
        if (i == spans.length / 2) { // kill-and-recover halfway through
          q.stop()
          q = start()
        }
        input.addData(feed.slice(a, b).toSeq)
        q.processAllAvailable()
      }
    }
    q.stop()

    // ---- reconstruct sessions from the changelog
    val rows = scala.jdk.CollectionConverters.IteratorHasAsScala(
      SessionParitySmoke.collected.iterator()).asScala.toArray
    val streamSessions: Map[String, Seq[(Long, Long, Long)]] =
      rows.groupBy(_.key).map { case (k, ks) =>
        val tombOffsets = ks.filter(_.tombstone).map(_.offset).toSet
        val states = ks.filter(o => !o.tombstone && o.state.isDefined)
        val closed = states.filter(o => tombOffsets.contains(o.offset))
          .groupBy(_.offset).map(_._2.head.state.get).toSeq
        val lastTomb = if (tombOffsets.isEmpty) Long.MinValue else tombOffsets.max
        val open = states.filter(_.offset > lastTomb) match {
          case a if a.isEmpty => Nil
          case a => Seq(a.maxBy(_.offset).state.get)
        }
        k -> (closed ++ open).sortBy(t => (t._2, t._3))
      }

    val ok = streamSessions == batchSessions
    if (!ok) {
      val keys = (streamSessions.keySet ++ batchSessions.keySet).toSeq.sorted
      keys.filter(k => streamSessions.get(k) != batchSessions.get(k)).take(5).foreach { k =>
        println(s"MISMATCH user=$k stream=${streamSessions.get(k)} batch=${batchSessions.get(k)}")
      }
      println(s"users stream=${streamSessions.size} batch=${batchSessions.size}")
    }
    spark.stop()
    println(s"SESSION_PARITY_OK=$ok (${batchSessions.valuesIterator.map(_.size).sum} sessions, " +
      s"${batchSessions.size} users)")
    sys.exit(if (ok) 0 else 1)
  }
}
