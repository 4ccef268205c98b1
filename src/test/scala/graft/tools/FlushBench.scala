package graft.tools

import graft.state.ExternalSnapshots
import graft.state.ExternalSnapshots.SnapshotRow
import org.apache.spark.sql.SparkSession

/** State-flush throughput probe (test scope) — the direct analogue of the
  * reference's ONLY published benchmark family (BASELINE.md Experiment B,
  * reference docs/kafka-single-writer-design.md:345-349): a concurrent
  * flush of 2000 keys × 10 KiB snapshots after a rebalance wave, measured
  * there at 282 ms (shared batched producer) / 300 ms (group-committed
  * transactions, default cap).
  *
  * The repo's analogue of that flush target is
  * [[ExternalSnapshots.upsert]]: the per-microbatch changelog append to
  * the external snapshot store — same role (durable per-key state pushed
  * off the hot path in one batched wave), same row volume, same value
  * size, compression framing engaged (10 KiB is at the LZ4 threshold,
  * like the reference's compressor). The input dataset is materialized
  * (eager localCheckpoint) BEFORE the clock starts, so the timing covers
  * exactly what the reference timed: serialize + frame + write + commit,
  * not state generation. Each timed run appends into a FRESH store so
  * every run writes the same volume; the recovery read (readLatest over
  * a multi-generation store) is timed separately — it is the reference's
  * restart path, not part of the flush number.
  *
  * Usage: sbt "Test/runMain graft.tools.FlushBench [keys] [bytes] [runs] [parts]"
  * `parts` = input partition count (the append inherits it; a 20 MB wave
  * doesn't need 32 commit tasks — the task/commit protocol is the floor
  * here, like network batching is the reference's).
  */
object FlushBench {
  def main(args: Array[String]): Unit = {
    val keys = args.lift(0).map(_.toInt).getOrElse(2000)
    val bytes = args.lift(1).map(_.toInt).getOrElse(10240)
    val runs = args.lift(2).map(_.toInt).getOrElse(5)
    val parts = args.lift(3).map(_.toInt).getOrElse(32)
    val base = s"/tmp/graft_flush_${System.nanoTime()}"

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // xorshift payloads: deterministic, high-entropy (≈ the worst case for
    // the LZ4 frame — a compressible corpus would only flush FASTER)
    val rows = spark.range(0, keys.toLong, 1, parts).map { i =>
      val b = new Array[Byte](bytes)
      var x = i * 0x9e3779b97f4a7c15L + 1
      var j = 0
      while (j < bytes) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        b(j) = x.toByte; j += 1
      }
      SnapshotRow("flush-bench", "g1", "events", (i % parts).toInt, s"key-$i",
        offset = i, metadata = "", value = b, written_at_ms = 0L)
    }.localCheckpoint(true)
    rows.count() // materialize before any clock

    try {
      val times = (0 to runs).map { r => // run 0 = untimed JVM/codegen warm
        val t0 = System.nanoTime()
        ExternalSnapshots.upsert(rows, s"$base/run_$r")
        val s = (System.nanoTime() - t0) / 1e9
        if (r > 0) println(f"FLUSHBENCH upsert run$r $s%.3f s (keys=$keys bytes=$bytes parts=$parts)")
        s
      }.drop(1)

      // recovery read over a store with `runs` appended generations: the
      // last-write-wins resolve + frame decode the restart path pays
      val multi = s"$base/multi"
      (1 to 3).foreach(_ => ExternalSnapshots.upsert(rows, multi))
      val t0 = System.nanoTime()
      val n = ExternalSnapshots.readLatest(spark, multi, "flush-bench", "g1").count()
      println(f"FLUSHBENCH readLatest ${(System.nanoTime() - t0) / 1e9}%.3f s " +
        f"($n keys over 3 generations)")

      println(f"FLUSHBENCH best ${times.min}%.3f s vs reference 0.282-0.300 s " +
        "(2000x10KiB concurrent flush, kafka-single-writer-design.md:345-349)")
    } finally {
      spark.stop()
      scala.reflect.io.Path(new java.io.File(base)).deleteRecursively()
    }
  }
}
