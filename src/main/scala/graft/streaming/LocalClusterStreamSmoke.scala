package graft.streaming

import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Multi-executor parity for the STREAMING engine — the streaming half of
  * the `LocalClusterParity` gate (see that tool's scaladoc for why
  * `local-cluster` evidence matters: every other measurement is one JVM
  * where nothing is ever really serialized to a remote process).
  *
  * The same [[KeyFlowTws]] pipeline — FoldOption with mid-stream deletes
  * and revivals, RocksDB state store, at-least-once replay overlap across
  * 4 microbatches — runs twice in this JVM:
  *
  *   phase A: `local[4]` (the basis every forked smoke uses)
  *   phase B: `local-cluster[2,2,2048]` — two REAL executor JVMs: the
  *            fold closure, the Record/FlowState/KeyOutput encoders, and
  *            the stateful-processor instance are serialized to remote
  *            processes; state-store partitions live in executor-side
  *            RocksDB instances; the keyed exchange crosses process
  *            boundaries through netty.
  *
  * Phase B additionally `kill -9`s one executor JVM between
  * microbatches 2 and 3 (default on; arg "nokill" isolates plain
  * parity): the dead executor's state-store partitions must be
  * reloaded from the checkpoint by whichever executor inherits them,
  * so the final compare also proves STATE SURVIVES EXECUTOR LOSS —
  * a stale or lost reload folds batches 3-4 from the wrong snapshot
  * and diverges the changelog.
  *
  * Exits 0 iff the final changelog (last row per key: state, tombstone)
  * is BIT-EXACT equal across the two masters and phase B actually saw
  * >= 3 block-manager processes (driver + 2 executors) — a silent
  * fallback to in-process execution cannot vacuously pass.
  *
  * Run standalone (the cluster Worker forks executor JVMs from
  * SPARK_HOME, so sbt's fork env is not enough):
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 java ... \
  *     graft.streaming.LocalClusterStreamSmoke
  * The gated spec (LocalClusterSpec) passes that env itself. Executor
  * classpath = this JVM's own `java.class.path` (class directories under
  * sbt, jars under java -cp — same host, never stale).
  */
object LocalClusterStreamSmoke {

  /** Per-key state: count, Long sum, last folded offset. */
  final case class Acc(n: Long, sum: Long, lastOff: Long)

  private def executorPids(): Seq[Long] = graft.LocalClusterEnv.executorPids()

  private val DeleteMarker = "DEL"

  /** Deterministic feed: 4000 records over 157 keys, a delete every 311
    * offsets (the key then revives on its next record — the
    * delete-then-revive branch), offsets strictly increasing. */
  private def feed: IndexedSeq[Record] = (0 until 4000).map { i =>
    val key = "k" + java.lang.Math.floorMod(i * 0x9E3779B9L, 157L)
    val body =
      if (i % 311 == 0) DeleteMarker
      else i.toString
    Record("t", 0, i.toLong, new Timestamp(i.toLong), 0, key,
      body.getBytes("UTF-8"), Map.empty)
  }

  private def runOnce(master: String, killMidStream: Boolean): (String, Long, Int) = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val cluster = master.startsWith("local-cluster")
    val b = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val b2 =
      if (!cluster) b
      else b
        .config("spark.executor.memory", "1536m")
        .config("spark.executor.extraClassPath",
          graft.LocalClusterEnv.absoluteClasspath)
        .config("spark.executor.extraJavaOptions",
          graft.LocalClusterEnv.executorAddOpens)
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val fold = FoldOption[Acc, Record] { (st, r) =>
      val body = new String(r.value, "UTF-8")
      if (body == DeleteMarker) None
      else {
        val v = body.toLong
        Some(st.fold(Acc(1L, v, r.offset))(s =>
          Acc(s.n + 1L, s.sum + v, r.offset)))
      }
    }

    val input = MemoryStream[Record]
    val sink = if (cluster) "lcs_cluster" else "lcs_local"
    val q = KeyFlowTws.flow(input.toDS(), fold)
      .writeStream.format("memory").queryName(sink)
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lcsmoke").toString)
      .start()

    // 4 microbatches; batch 2 replays the tail of batch 1 (at-least-once)
    val all = feed
    val cuts = (1 to 3).map(i => all.length * i / 4)
    val b1 = all.slice(0, cuts(0))
    val batches = Seq(
      b1,
      b1.takeRight(97) ++ all.slice(cuts(0), cuts(1)),
      all.slice(cuts(1), cuts(2)),
      all.slice(cuts(2), all.length))
    // max across batches, not a single end-of-run sample: after the kill
    // the replacement executor may not have re-registered yet, so a final
    // snapshot could read 2 and fail the >=3-process assertion even
    // though both executors demonstrably ran batches 1-2
    var executors = 0
    batches.zipWithIndex.foreach { case (batch, i) =>
      // the resilience leg: after microbatch 2 commits, kill -9 one
      // executor JVM. Its state-store partitions MUST be reloaded from
      // the checkpoint on whichever executor picks them up for batch 3
      // — a lost or stale reload shows up as a changelog divergence
      // (counts/sums fold from the wrong snapshot), which the bit-exact
      // compare below catches.
      if (killMidStream && i == 2) {
        val pids = executorPids()
        require(pids.size >= 2, s"expected 2 executors before kill: $pids")
        Runtime.getRuntime.exec(
          Array("kill", "-9", pids.head.toString)).waitFor()
        println(s"[lcsmoke] killed executor pid ${pids.head} " +
          "between microbatches 2 and 3")
      }
      input.addData(batch); q.processAllAvailable()
      executors = math.max(executors,
        spark.sparkContext.getExecutorMemoryStatus.size)
    }

    val rows = spark.table(sink).as[KeyOutput[Acc]].collect()
    q.stop()

    // final changelog row per key, canonicalized and order-insensitively
    // hashed (same discipline as LocalClusterParity)
    val finals = rows.groupBy(_.key).toSeq.map { case (k, rs) =>
      val last = rs.maxBy(_.offset)
      s"$k|${last.offset}|${last.tombstone}|" +
        last.state.map(a => s"${a.n},${a.sum},${a.lastOff}").getOrElse("-")
    }.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    finals.foreach { l => md.update(l.getBytes("UTF-8")); md.update('\n'.toByte) }
    val hash = md.digest().map("%02x".format(_)).mkString

    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    (hash, finals.length.toLong, executors)
  }

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME"),
      "SPARK_HOME must point at the Spark distro (executor launch)")
    // default ON: the kill leg makes the parity claim strictly stronger
    // (state survives executor loss); pass "nokill" to isolate plain
    // parity when debugging a divergence
    val kill = !args.contains("nokill")
    val (hLocal, nLocal, _) = runOnce("local[4]", killMidStream = false)
    val (hClus, nClus, executors) = runOnce("local-cluster[2,2,2048]", kill)
    val multiProc = executors >= 3
    val ok = hLocal == hClus && nLocal == nClus && multiProc
    println(s"LOCAL_CLUSTER_STREAM_OK=$ok keys=$nLocal/$nClus " +
      s"hash=${hLocal.take(12)}/${hClus.take(12)} executors=$executors " +
      s"killLeg=$kill " +
      s"(multi-process ${if (multiProc) "PROVEN" else "NOT PROVEN"})")
    sys.exit(if (ok) 0 else 1)
  }
}
