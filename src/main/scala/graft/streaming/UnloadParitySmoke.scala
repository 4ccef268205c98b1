package graft.streaming

import graft.Tables
import graft.fold.{FoldOption, TickOption}
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp
import scala.concurrent.duration._

/** Stream↔batch parity for T5 unloadOrphaned (SURVEY §7.5's batch+streaming
  * requirement, complementing SessionParitySmoke's session coverage): the
  * q_unload_idle semantics — keys with an event in the last `maxIdle` of the
  * stream, with their TOTAL event count and last event time — computed two
  * ways over the real sf0.001 events table and asserted exactly equal:
  *
  *  - batch: the declared oracle-backed aggregate (groupBy + recency filter;
  *    q_unload_idle uses a 2-day window at sf0.01 — here the window is 12 h
  *    because at sf0.001 no user is 2 days idle, and a parity run that never
  *    unloads proves nothing: 12 h unloads 5 of 15 users at the end AND
  *    forces ~300 mid-stream unload-then-revive cycles through the
  *    segment-sum reconstruction below);
  *  - streaming: events replayed through [[KeyFlowTws]] with watermark-domain
  *    maxIdle = 12 h and removeOnIdle = true, across several microbatches.
  *    A key idle for 12 h of EVENT time is unloaded (timer or retroactive
  *    expiry) and its state discarded, exactly like the reference's
  *    unloadOrphaned eviction (timer/TimerFlowOf.scala:36-77); a revived key
  *    folds from scratch.
  *
  * Parity on totals holds BECAUSE the engine emits each segment's closing
  * state before its tombstone: a revived user's full count is the sum of
  * its closed-segment counts plus the open segment — the same changelog
  * reconstruction SessionParitySmoke uses, and the property that lets an
  * external store (P4) retain evicted state durably while memory stays
  * bounded. The final loaded-key set must equal the batch filter output:
  * unload fires iff the final watermark (= max event time) passed the key's
  * last event + maxIdle.
  *
  * Exits 0 iff the reconstructed (user → (n_events, last_ms)) map over
  * loaded keys matches batch. Forked by StreamBatchParitySpec (Spark 4.1
  * stateful exec NPEs under the sbt test harness — see TimerSmoke).
  */
object UnloadParitySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val idleMs = 12L * 3600 * 1000
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // ---- batch truth: the q_unload_idle shape
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts div 1000000").as("ms"))
    val gmax = e.agg(max("ms")).head().getLong(0)
    val batchKept: Map[String, (Long, Long)] = e.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("ms").as("last_ms"))
      .filter(col("last_ms") >= gmax - idleMs)
      .collect()
      .map(r => r.getLong(0).toString -> (r.getLong(1), r.getLong(2))).toMap

    // ---- streaming: replay in event-time order, offset = feed index
    val feed = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._2))
      .zipWithIndex
      .map { case ((u, _, ms), idx) =>
        Record("events", 0, idx.toLong, new Timestamp(ms), 0, u.toString,
          Array[Byte](), Map.empty)
      }
    val lastOffset: Map[String, Long] =
      feed.groupBy(_.key).map { case (k, rs) => k -> rs.map(_.offset).max }
    val expectUnloaded = lastOffset.keySet -- batchKept.keySet

    val fold = FoldOption.of[(Long, Long), Record] { r =>
      (1L, r.timestamp.getTime)
    } { (st, r) => (st._1 + 1, math.max(st._2, r.timestamp.getTime)) }
    val config = KeyFlowConfig(
      maxIdle = Some(idleMs.millis), removeOnIdle = true,
      timerDomain = TimerDomain.Watermark)
    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(
      input.toDS().withWatermark("timestamp", "0 seconds"),
      fold, TickOption.id[(Long, Long)], config)
    val q = out.writeStream.format("memory").queryName("unloadparity")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(200))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("unloadparity").toString)
      .start()

    // several microbatches, split only where event time strictly increases
    // (equal timestamps never straddle a watermark update)
    val nBatches = 6
    val cuts = (1 until nBatches).map(i => feed.length * i / nBatches).map { c0 =>
      var c = c0
      while (c < feed.length && c > 0 &&
        feed(c).timestamp.getTime == feed(c - 1).timestamp.getTime) c += 1
      c
    }.distinct.filter(c => c > 0 && c < feed.length)
    (Seq(0) ++ cuts ++ Seq(feed.length)).sliding(2).foreach { case Seq(a, b) =>
      if (b > a) {
        input.addData(feed.slice(a, b).toSeq)
        q.processAllAvailable()
      }
    }

    // end-of-stream timers fire in no-data batches once the final watermark
    // (gmax) is in force — poll until every expected unload is tombstoned
    // at that user's final offset
    def snapshot(): Array[KeyOutput[(Long, Long)]] =
      spark.table("unloadparity").as[KeyOutput[(Long, Long)]].collect()
    val deadline = System.currentTimeMillis() + 120000
    var rows = snapshot()
    while (System.currentTimeMillis() < deadline && !expectUnloaded.forall(u =>
        rows.exists(o => o.key == u && o.tombstone && o.offset == lastOffset(u)))) {
      Thread.sleep(200); rows = snapshot()
    }
    q.stop()

    // ---- reconstruct totals: closed segments (state rows at tombstone
    // offsets) + the open segment past the last tombstone
    val streamKept: Map[String, (Long, Long)] = rows.groupBy(_.key).flatMap {
      case (k, ks) =>
        val tombOffsets = ks.filter(_.tombstone).map(_.offset).toSet
        val states = ks.filter(o => !o.tombstone && o.state.isDefined)
        val closedN = states.filter(o => tombOffsets.contains(o.offset))
          .groupBy(_.offset).map(_._2.head.state.get._1).sum
        val lastTomb = if (tombOffsets.isEmpty) Long.MinValue else tombOffsets.max
        states.filter(_.offset > lastTomb) match {
          case a if a.isEmpty => None
          case a =>
            val open = a.maxBy(_.offset).state.get
            Some(k -> (closedN + open._1, open._2))
        }
    }

    val ok = streamKept == batchKept
    if (!ok) {
      val keys = (streamKept.keySet ++ batchKept.keySet).toSeq.sorted
      keys.filter(k => streamKept.get(k) != batchKept.get(k)).take(5).foreach { k =>
        println(s"MISMATCH user=$k stream=${streamKept.get(k)} batch=${batchKept.get(k)}")
      }
      println(s"users stream=${streamKept.size} batch=${batchKept.size}")
    }
    spark.stop()
    println(s"UNLOAD_PARITY_OK=$ok (${batchKept.size} loaded of ${lastOffset.size} users, " +
      s"${expectUnloaded.size} unloaded)")
    sys.exit(if (ok) 0 else 1)
  }
}
