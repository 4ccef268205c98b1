package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.{KafkaKey, Record, Snapshot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** CROSS-JOB eager recovery from the external snapshot store — the
  * reference's `kafkaEagerRecovery` semantics (persistence-kafka
  * package.scala:58-174 + KeyStateOf.eagerRecovery): job 1 folds a prefix
  * of the log and persists per-key snapshots to [[graft.state.ExternalSnapshots]];
  * job 2 is a BRAND-NEW query — fresh checkpoint, zero Spark state — that
  * seeds `KeyFlowTws.flowWithInitialState` from `readLatest` and consumes
  * the rest of the log WITH a replay overlap. The claim is the
  * reference's golden restart invariant across INDEPENDENT jobs sharing
  * only the store:
  *
  *  1. continuity — final counts equal the one-shot batch aggregate over
  *     the whole log;
  *  2. idempotence — the seeded snapshot offsets arm the P9 guard, so
  *     records job 1 already folded re-deliver as no-ops.
  *
  * Exits 0 iff every user's count matches. Forked by StreamBatchParitySpec
  * (Spark 4.1 stateful exec NPEs under sbt test — see TimerSmoke).
  */
object BootstrapSmoke {
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
      .select(col("event_id"), col("user_id")).collect()
      .map(r => Record("events", 0, r.getLong(0), new Timestamp(0L), 0,
        r.getLong(1).toString, Array.empty[Byte], Map.empty))
      .sortBy(_.offset)
    val cut = events.length * 3 / 5
    val (phaseA, phaseB) = events.splitAt(cut)

    val countFold = FoldOption.of[Long, Record](_ => 1L)((n, _) => n + 1)

    def finalStates(name: String): Map[String, (Long, Long)] =
      spark.table(name).as[KeyOutput[Long]]
        .collect().groupBy(_.key).toSeq
        .map { case (k, rows) =>
          val last = rows.maxBy(_.offset)
          k -> ((last.state.get, last.offset))
        }.toMap

    // ---- job 1: fold the prefix, persist snapshots to the external store
    val in1 = MemoryStream[Record]
    val q1 = KeyFlowTws.flow(in1.toDS(), countFold)
      .writeStream.format("memory").queryName("bootjob1")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bootjob1").toString)
      .start()
    in1.addData(phaseA.toSeq); q1.processAllAvailable(); q1.stop()
    val job1 = finalStates("bootjob1")

    val store = java.nio.file.Files.createTempDirectory("bootstore").toString
    graft.state.ExternalSnapshots.upsert(
      job1.toSeq.map { case (user, (count, offset)) =>
        graft.state.ExternalSnapshots.rowFor(
          KafkaKey("app", "g", "events", 0, user), offset, "",
          count.toString.getBytes("UTF-8"))
      }.toDS(), store)

    // ---- job 2: FRESH query seeded from the store; replay overlap + rest
    val seed = graft.state.ExternalSnapshots.readLatest(spark, store, "app", "g")
      .collect()
      .map(r => (r.getAs[String]("key"), FlowState(
        Snapshot(r.getAs[Long]("offset"), "",
          new String(r.getAs[Array[Byte]]("value"), "UTF-8").toLong),
        0L, Long.MinValue)))
      .toSeq.toDS()
    val in2 = MemoryStream[Record]
    val q2 = KeyFlowTws.flowWithInitialState(in2.toDS(), countFold, seed)
      .writeStream.format("memory").queryName("bootjob2")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bootjob2").toString)
      .start()
    // replay the tail of phase A (already folded by job 1) + all of B
    in2.addData((phaseA.takeRight(100) ++ phaseB.take(phaseB.length / 2)).toSeq)
    q2.processAllAvailable()
    in2.addData(phaseB.drop(phaseB.length / 2).toSeq)
    q2.processAllAvailable()

    // keys untouched by job 2 keep their seeded counts: merge store + outputs
    val job2Out = finalStates("bootjob2")
    val streamed = job1.map { case (k, (n, off)) => k -> ((n, off)) } ++ job2Out
    q2.stop()

    val batch = Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("event_id").as("maxo"))
      .collect()
      .map(r => r.getLong(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap

    val ok = streamed == batch
    if (!ok) {
      val ks = (streamed.keySet ++ batch.keySet).toSeq.sortBy(_.toLong)
      ks.filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
        println(s"MISMATCH user=$k stream=${streamed.get(k)} batch=${batch.get(k)}")
      }
    }
    spark.stop()
    println(s"BOOTSTRAP_OK=$ok (${batch.size} users, cut=$cut, overlap=100)")
    sys.exit(if (ok) 0 else 1)
  }
}
