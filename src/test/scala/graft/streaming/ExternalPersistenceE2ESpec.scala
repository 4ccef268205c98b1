package graft.streaming

import graft.SparkTestBase
import graft.fold.FoldOption
import graft.model.{KafkaKey, Record}
import graft.state.ExternalSnapshots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files
import java.sql.Timestamp

/** The reference's core durability story end-to-end: the flow persists
  * per-key snapshots to an EXTERNAL store from foreachBatch, the job
  * restarts from its checkpoint, and at-least-once batch replay cannot
  * corrupt the store (last-write-wins by offset = the reference's
  * idempotent-replay invariant, docs/persistence.md:7-27).
  */
class ExternalPersistenceE2ESpec extends SparkTestBase {

  private def rec(key: String, offset: Long): Record =
    Record("t", 0, offset, new Timestamp(offset * 1000), 0, key, Array[Byte](), Map.empty)

  test("flow -> foreachBatch -> external snapshots survives restart and replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val store = Files.createTempDirectory("ext-store").toString
    val ckpt = Files.createTempDirectory("ext-ckpt").toString
    val countFold = FoldOption.of[Long, Record](_ => 1L)((n, _) => n + 1)
    val input = MemoryStream[Record]
    val out = KeyFlow.flow(input.toDS(), countFold)

    def start() = out.writeStream
      .outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyOutput[Long]], _: Long) =>
        val rows = batch.collect().toSeq.map { o =>
          ExternalSnapshots.rowFor(KafkaKey("app", "g", "t", 0, o.key), o.offset, "",
            o.state.map(_.toString.getBytes("UTF-8")).orNull)
        }
        import batch.sparkSession.implicits._
        ExternalSnapshots.upsert(rows.toDS(), store)
      }
      .start()

    val q1 = start()
    input.addData(rec("k1", 0), rec("k1", 1), rec("k2", 2))
    q1.processAllAvailable()
    q1.stop()

    def storeState(): Map[String, String] =
      ExternalSnapshots.readLatest(spark, store, "app", "g").collect()
        .map(r => r.getAs[String]("key") -> new String(r.getAs[Array[Byte]]("value"))).toMap
    assert(storeState() == Map("k1" -> "2", "k2" -> "1"))

    // simulate at-least-once: the same changelog rows written again
    // (e.g. foreachBatch retried after a sink failure) must be a no-op
    ExternalSnapshots.upsert(Seq(
      ExternalSnapshots.rowFor(KafkaKey("app", "g", "t", 0, "k1"), 1L, "", "2".getBytes),
      ExternalSnapshots.rowFor(KafkaKey("app", "g", "t", 0, "k1"), 0L, "", "1".getBytes)).toDS(), store)
    assert(storeState() == Map("k1" -> "2", "k2" -> "1"))

    // restart from checkpoint: engine state continues; store follows
    val q2 = start()
    input.addData(rec("k1", 3))
    q2.processAllAvailable()
    q2.stop()
    assert(storeState() == Map("k1" -> "3", "k2" -> "1"))
  }
}
