package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for the TIME-WEIGHTED AVERAGE: the declared
  * `q_twap` integrates each user's value step-function in batch; a
  * streaming fold maintains the same integral online — state is
  * (last ms, last cents, accumulated area, first ms, n) and each arriving
  * event closes the previous value's interval. The per-user
  * (n, dur, area, twa) quadruple must equal the batch output row for row.
  *
  * Order matters here (the integral depends on consecutive deltas), so
  * per-key arrival order follows the global (ms, event_id) order like the
  * SCD2 twin, and the replay overlap leans on the engine's P9 offset
  * guard — a re-delivered event would re-close an interval and inflate
  * the area, which is exactly why the guard exists for non-idempotent
  * folds.
  *
  * Exits 0 iff every user matches. Forked by StreamBatchParitySpec.
  */
object TwapParitySmoke {
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

    // ---- batch truth: the declared query's grain
    val batch: Map[String, (Long, Long, Option[Long])] =
      graft.SparkEntry.queries("q_twap")(spark, dir)
        .collect().map { r =>
          r.getLong(0).toString ->
            ((r.getLong(1), r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getLong(3))))
        }.toMap

    // ---- streaming: events keyed by user in global (ms, event_id) order
    val feed = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000").as("ms"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy { case (_, id, ms, _) => (ms, id) }
      .zipWithIndex
      .map { case ((user, _, ms, cents), seq) =>
        Record("events", 0, seq.toLong, new Timestamp(0L), 0, user.toString,
          s"$ms|$cents".getBytes("UTF-8"), Map.empty)
      }

    // state: (firstMs, lastMs, lastCents, area, n)
    val step: ((Long, Long, Long, Long, Long), Record) => (Long, Long, Long, Long, Long) = { (st, r) =>
      val Array(msS, cS) = new String(r.value, "UTF-8").split('|')
      val ms = msS.toLong
      val c = cS.toLong
      val (first, lastMs, lastC, area, n) = st
      (first, ms, c, area + lastC * (ms - lastMs), n + 1)
    }
    val fold = FoldOption.of[(Long, Long, Long, Long, Long), Record] { r =>
      val Array(msS, cS) = new String(r.value, "UTF-8").split('|')
      (msS.toLong, msS.toLong, cS.toLong, 0L, 1L)
    }(step)

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("twapparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("twapparity").toString)
      .start()
    // 4 microbatches; the second re-sends the tail of the first — the
    // area fold is NOT replay-idempotent, so this passes only through
    // the engine's offset guard
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(30) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, (Long, Long, Option[Long])] =
      spark.table("twapparity").as[KeyOutput[(Long, Long, Long, Long, Long)]]
        .collect().groupBy(_.key).toSeq
        .map { case (u, rows) =>
          val (first, lastMs, _, area, n) = rows.maxBy(_.offset).state.get
          val dur = lastMs - first
          u -> ((n, dur, if (dur == 0) None else Some(area / dur)))
        }.toMap
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
    println(s"TWAP_PARITY_OK=$ok (${batch.size} users)")
    sys.exit(if (ok) 0 else 1)
  }
}
