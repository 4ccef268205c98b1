package graft.streaming

import graft.fold.{FoldOption, TickOption}
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** USER-REGISTERED OFFSET-DOMAIN TIMERS (T9 — reference
  * timer/KafkaTimer.scala:16-45: `KafkaTimer.Offset(value)` registered via
  * `TimerWindow.of(value, window)`): `KeyFlowConfig.tickEveryOffsets = n`
  * runs the user Tick whenever the key's source-partition offset clock
  * advances >= n offsets past the last tick basis.
  *
  * The smoke drives two keys on one partition through three microbatches
  * with n = 10 and asserts the EXACT deterministic tick counts:
  *
  *  - key a: first offset 0 → batch clocks 4 / 14 / 39 fire 0, 1, 1 ticks
  *    (the 14→39 jump crosses two windows but ticks ONCE — TimerWindow
  *    semantics — with the basis re-armed window-aligned at 30);
  *  - key b: first offset 1 → same clocks fire 0, 1, 1 ticks
  *    (per-key bases are independent: b's windows are 11, 21, 31...).
  *
  * State = (n_folds, n_ticks); fold counts records, tick counts wakeups —
  * so the memory-sink changelog pins both the fire COUNT and that folds
  * keep running between ticks. Exits 0 iff both keys match exactly.
  * Forked by OffsetTimerSpec (Spark 4.1 stateful exec NPEs under the sbt
  * test harness — see TimerSmoke).
  */
object OffsetTimerSmoke {
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

    def rec(offset: Long, key: String): Record =
      Record("t", 0, offset, new Timestamp(1000L + offset), 0, key,
        Array[Byte](), Map.empty)

    // batch 1: offsets 0..4 (a@0, a@4, b rest)        clock 4
    // batch 2: offsets 5..14 (a@14, b rest sampled)   clock 14
    // batch 3: offsets 15..39 (a@39, b@20)            clock 39
    val b1 = Seq(rec(0, "a"), rec(1, "b"), rec(2, "b"), rec(3, "b"), rec(4, "a"))
    val b2 = Seq(rec(5, "b"), rec(9, "b"), rec(14, "a"))
    val b3 = Seq(rec(20, "b"), rec(39, "a"))

    val fold = FoldOption.of[(Long, Long), Record] { _ => (1L, 0L) } {
      (st, _) => (st._1 + 1, st._2)
    }
    val tick = TickOption[(Long, Long)](_.map(st => (st._1, st._2 + 1)))
    val config = KeyFlowConfig(tickEveryOffsets = Some(10L))

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold, tick, config)
    val q = out.writeStream.format("memory").queryName("offsettimer")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(100))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("offsettimer").toString)
      .start()
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val rows = spark.table("offsettimer").as[KeyOutput[(Long, Long)]].collect()
    def latest(k: String): (Long, Long) =
      rows.filter(r => r.key == k && !r.tombstone).maxBy(_.offset).state.get
    // a: 4 folds; ticks at clock 14 (window [0,10)->basis 10) and clock 39
    // (single tick, basis 30). b: 6 folds; ticks at 14 (basis 11->11+?):
    // 14-1=13 -> 1 tick, basis 11; 39-11=28 -> 1 tick, basis 31.
    val a = latest("a")
    val b = latest("b")
    val okA = a == ((4L, 2L))
    val okB = b == ((6L, 2L))
    // no spurious mid-batch duplicates: each batch emits one row per key
    val perBatchDups = rows.groupBy(r => (r.key, r.offset)).exists(_._2.length > 2)
    val ok = okA && okB && !perBatchDups
    if (!ok) println(s"MISMATCH a=$a (want (4,2)) b=$b (want (6,2)) dups=$perBatchDups")
    spark.stop()
    println(s"OFFSET_TIMER_OK=$ok")
    sys.exit(if (ok) 0 else 1)
  }
}
