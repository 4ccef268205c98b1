package graft.streaming

import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp
import scala.concurrent.duration._

/** Native state-TTL check (C-tier RecordExpiration inside the engine):
  * with `stateTtl = 1s`, a key's state untouched past the TTL reads as
  * absent, so a later record folds FROM SCRATCH (count restarts at 1); an
  * identical pipeline without TTL keeps folding (count reaches 2). Exits 0
  * iff both behave. Forked by KeyFlowSpec (see TimerSmoke for why). */
object TtlSmoke {
  def rec(key: String, offset: Long): Record =
    Record("t", 0, offset, new Timestamp(offset * 1000), 0, key, Array[Byte](), Map.empty)

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

    def lastCount(name: String, config: KeyFlowConfig): Option[Long] = {
      val input = MemoryStream[Record]
      val out = KeyFlowTws.flow(input.toDS(), countFold, config = config)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update")
        .trigger(Trigger.ProcessingTime(200))
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(name).toString)
        .start()
      // processAllAvailable can block forever once TimeMode.ProcessingTime
      // is active (the engine keeps scheduling batches) — poll with a
      // deadline instead (see TimerSmoke)
      def waitFor(p: Array[KeyOutput[Long]] => Boolean): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        var ok = false
        while (!ok && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          ok = p(spark.table(name).as[KeyOutput[Long]].collect())
        }
      }
      input.addData(rec("k1", 0))
      waitFor(_.exists(o => o.key == "k1" && o.offset == 0L))
      Thread.sleep(2500) // past the 1s TTL
      input.addData(rec("k1", 1))
      waitFor(_.exists(o => o.key == "k1" && o.offset == 1L))
      val rows = spark.table(name).as[KeyOutput[Long]].collect()
      q.stop()
      rows.filter(o => o.key == "k1" && !o.tombstone).sortBy(_.offset).lastOption.flatMap(_.state)
    }

    val withTtl = lastCount("ttlon", KeyFlowConfig(stateTtl = Some(1.second)))
    val without = lastCount("ttloff", KeyFlowConfig())
    val ok = withTtl.contains(1L) && without.contains(2L)
    spark.stop()
    println(s"TTL_SMOKE withTtl=$withTtl without=$without")
    println(s"TTL_SMOKE_OK=$ok")
    sys.exit(if (ok) 0 else 1)
  }
}
