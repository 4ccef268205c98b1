package graft.streaming

import graft.fold.{FoldOption, TickOption}
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp
import scala.concurrent.duration._

/** Watermark-domain timer check (T1's third domain, reference
  * timer/Timestamp.scala:6-10, timer/KafkaTimer.scala:16-45): a key idle in
  * EVENT time is ticked/tombstoned when the QUERY WATERMARK passes its last
  * event time + maxIdle — advanced by OTHER keys' records, with no new data
  * for the expiring key and no wall-clock dependence.
  *
  * Scenario (both engines): key A at t=10s, then key B at t=100s. The
  * watermark (delay 0) advances to 100s, so A's timer at 15s fires in the
  * no-data batch → tombstone for A at its own offset; B (timer 105s) stays.
  * Exits 0 iff both the transformWithState and the flatMapGroupsWithState
  * engine produce exactly that.
  *
  * A main forked by KeyFlowSpec rather than an inline scalatest body: Spark
  * 4.1's stateful exec nodes NPE under the sbt test harness's thread
  * context (see TimerSmoke).
  */
object WatermarkSmoke {
  /** foreachBatch output for the restart scenario (driver-local queue —
    * fine under local master, same pattern as KeyFlowSpec's golden map). */
  val collected = new java.util.concurrent.ConcurrentLinkedQueue[KeyOutput[Long]]()

  def rec(key: String, offset: Long, eventMs: Long): Record =
    Record("t", 0, offset, new Timestamp(eventMs), 0, key, Array[Byte](), Map.empty)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val countFold = FoldOption.of[Long, Record](_ => 1L)((n, _) => n + 1)
    val config = KeyFlowConfig(
      maxIdle = Some(5.seconds), removeOnIdle = true,
      timerDomain = TimerDomain.Watermark)

    def run(name: String)(
        mk: org.apache.spark.sql.Dataset[Record] => org.apache.spark.sql.Dataset[KeyOutput[Long]]): Boolean = {
      val ckpt = java.nio.file.Files.createTempDirectory(name).toString
      val input = MemoryStream[Record]
      val out = mk(input.toDS().withWatermark("timestamp", "0 seconds"))
      def start(qn: String) = out.writeStream.format("memory").queryName(qn)
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(200))
        .option("checkpointLocation", ckpt)
        .start()
      def waitFor(qn: String, deadlineMs: Long)(p: Array[KeyOutput[Long]] => Boolean): Boolean = {
        val deadline = System.currentTimeMillis() + deadlineMs
        var ok = false
        while (!ok && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          ok = p(spark.table(qn).as[KeyOutput[Long]].collect())
        }
        ok
      }
      val q = start(name)
      input.addData(rec("a", 0, 10000L))
      // batch with a commits (state + its event-time timer at 15s durable)
      waitFor(name, 30000)(_.exists(o => o.key == "a" && !o.tombstone))
      input.addData(rec("b", 1, 100000L)) // advances the watermark past a's expiry (15s)
      val aTombstoned =
        waitFor(name, 60000)(_.exists(o => o.key == "a" && o.tombstone && o.offset == 0L))
      val rows = spark.table(name).as[KeyOutput[Long]].collect()
      q.stop()
      val bIntact = rows.exists(o => o.key == "b" && !o.tombstone) &&
        !rows.exists(o => o.key == "b" && o.tombstone)
      println(s"WATERMARK_SMOKE $name aTombstoned=$aTombstoned bIntact=$bIntact")
      aTombstoned && bIntact
    }

    // Restart scenario: the registered event-time timer and the watermark
    // must come back from the CHECKPOINT, not JVM memory. The memory sink
    // refuses recovery, so this one collects via foreachBatch (the
    // recovery-capable test sink).
    def runRestart(name: String): Boolean = {
      val ckpt = java.nio.file.Files.createTempDirectory(name).toString
      val input = MemoryStream[Record]
      val out = KeyFlowTws.flow(
        input.toDS().withWatermark("timestamp", "0 seconds"),
        countFold, TickOption.id[Long], config)
      def start() = out.writeStream
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(200))
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[KeyOutput[Long]], _: Long) =>
          b.collect().foreach(WatermarkSmoke.collected.add)
        }
        .start()
      def waitFor(deadlineMs: Long)(p: Iterator[KeyOutput[Long]] => Boolean): Boolean = {
        val deadline = System.currentTimeMillis() + deadlineMs
        var ok = false
        while (!ok && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          ok = p(scala.jdk.CollectionConverters.IteratorHasAsScala(
            WatermarkSmoke.collected.iterator()).asScala)
        }
        ok
      }
      var q = start()
      input.addData(rec("a", 0, 10000L))
      waitFor(30000)(_.exists(o => o.key == "a" && !o.tombstone))
      q.stop() // kill after a's batch committed (timer + watermark durable)
      q = start()
      input.addData(rec("b", 1, 100000L))
      val aTombstoned =
        waitFor(60000)(_.exists(o => o.key == "a" && o.tombstone && o.offset == 0L))
      q.stop()
      val rows = scala.jdk.CollectionConverters.IteratorHasAsScala(
        WatermarkSmoke.collected.iterator()).asScala.toArray
      val bIntact = rows.exists(o => o.key == "b" && !o.tombstone) &&
        !rows.exists(o => o.key == "b" && o.tombstone)
      println(s"WATERMARK_SMOKE $name aTombstoned=$aTombstoned bIntact=$bIntact")
      aTombstoned && bIntact
    }

    // No-double-tick regression (both engines): after a watermark timer
    // fires a TRANSFORMING tick with removeOnIdle=false, the event-time
    // basis must advance with the re-armed timer — a later record inside
    // the NEW idle window folds into the ticked state without the
    // retroactive path re-ticking the same gap (state 102, not 202). On the
    // TWS engine this guards the re-arm clamp in
    // KeyFlowProcessor.handleExpiredTimer (basis = max(expiry, watermark)):
    // without it a watermark jump > 2× maxIdle re-fires once per maxIdle of
    // event-time gap (state ≥ 200 before offset 2 ever folds).
    def runNoDoubleTick(name: String)(
        mk: (org.apache.spark.sql.Dataset[Record], FoldOption[Long, Record],
             TickOption[Long], KeyFlowConfig) => org.apache.spark.sql.Dataset[KeyOutput[Long]]): Boolean = {
      val input = MemoryStream[Record]
      val markTick = graft.fold.TickOption[Long](n => n.map(_ + 100L))
      val cfg = KeyFlowConfig(maxIdle = Some(5.seconds), removeOnIdle = false,
        timerDomain = TimerDomain.Watermark)
      val out = mk(
        input.toDS().withWatermark("timestamp", "0 seconds"), countFold, markTick, cfg)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(200))
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(name).toString)
        .start()
      def waitFor(deadlineMs: Long)(p: Array[KeyOutput[Long]] => Boolean): Boolean = {
        val deadline = System.currentTimeMillis() + deadlineMs
        var ok = false
        while (!ok && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          ok = p(spark.table(name).as[KeyOutput[Long]].collect())
        }
        ok
      }
      input.addData(rec("a", 0, 10000L))
      waitFor(30000)(_.exists(o => o.key == "a" && o.state.contains(1L)))
      input.addData(rec("b", 1, 100000L)) // watermark -> 100s; a's timer (15s) fires tick #1
      waitFor(60000)(_.exists(o => o.key == "a" && o.state.contains(101L)))
      // inside the NEW idle window (basis advanced to ~100s): must fold, not re-tick
      input.addData(rec("a", 2, 101000L))
      val folded = waitFor(30000)(_.exists(o =>
        o.key == "a" && o.offset == 2L && o.state.contains(102L)))
      val rows = spark.table(name).as[KeyOutput[Long]].collect()
      q.stop()
      val noDouble = !rows.exists(o => o.key == "a" && o.state.exists(_ >= 200L))
      println(s"WATERMARK_SMOKE $name foldedAfterTick=$folded noDoubleTick=$noDouble")
      folded && noDouble
    }

    val twsOk = run("wmtws")(ds => KeyFlowTws.flow(ds, countFold, TickOption.id[Long], config))
    val classicOk = run("wmclassic")(ds => KeyFlow.flow(ds, countFold, TickOption.id[Long], config))
    val restartOk = runRestart("wmtwsrestart")
    val noDoubleOk = runNoDoubleTick("wmnodouble")(KeyFlow.flow(_, _, _, _))
    val noDoubleTwsOk = runNoDoubleTick("wmnodoubletws")(KeyFlowTws.flow(_, _, _, _))
    spark.stop()
    val allOk = twsOk && classicOk && restartOk && noDoubleOk && noDoubleTwsOk
    println(s"WATERMARK_SMOKE_OK=$allOk")
    sys.exit(if (allOk) 0 else 1)
  }
}
