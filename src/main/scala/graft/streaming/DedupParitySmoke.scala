package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for the north-star EXACT DEDUP operator: the engine
  * claims stream/batch parity for its stateful surface, and the LLM-pipeline
  * suite is otherwise batch-only — this proves the claim holds for at least
  * one pipeline operator, the pattern UnloadParitySmoke set for T5.
  *
  * The `q_dedup_exact` semantics — per content digest, the duplicate count
  * and the minimum (kept) doc id — computed two ways over the real sf0.001
  * documents table plus synthetic re-crawls (every third doc re-sent under a
  * high id, so digest groups of size > 1 actually exist) and asserted equal:
  *
  *  - batch: [[graft.operators.Dedup.exact]], the declared oracle-backed
  *    aggregate, over the augmented corpus;
  *  - streaming: the same corpus replayed through [[KeyFlowTws]] keyed by
  *    digest, folding (count, min id) incrementally across several
  *    microbatches WITH a replay overlap (batch 2 re-sends the tail of
  *    batch 1), so the at-least-once offset-dedup guard is part of the
  *    parity claim. No timers — this is the pure FoldToState surface on
  *    the transformWithState engine.
  *
  * An incremental exact-dedup is exactly what a streaming ingest pipeline
  * runs at 100 TB: the keep-min state per digest is O(1), and the final
  * states must equal the batch groupBy bit-for-bit.
  *
  * Exits 0 iff per-digest (n_docs, keep_id) matches batch for every key.
  * Forked by StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under the
  * sbt test harness — see TimerSmoke).
  */
object DedupParitySmoke {
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

    // ---- augmented corpus: originals + re-crawls of every third doc
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val recrawls = base.filter(_._1 % 3 == 0).map { case (id, t) => (id + 1000000L, t) }
    val corpus = base ++ recrawls

    // ---- batch truth: the declared operator over the augmented corpus
    val corpusDf = spark.createDataFrame(corpus.toSeq).toDF("doc_id", "text")
    val batch: Map[String, (Long, Long)] = Dedup.exact(corpusDf, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // ---- streaming: replay keyed by digest, offset = doc id (unique)
    val digests = corpusDf
      .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val feed = corpus.map(_._1).sorted.map { id =>
      Record("documents", 0, id, new Timestamp(0L), 0, digests(id),
        id.toString.getBytes("UTF-8"), Map.empty)
    }

    def docId(r: Record): Long = new String(r.value, "UTF-8").toLong
    val fold = FoldOption.of[(Long, Long), Record] { r =>
      (1L, docId(r))
    } { (st, r) => (st._1 + 1, math.min(st._2, docId(r))) }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("dedupparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("dedupparity").toString)
      .start()

    // 4 microbatches; batch 2 re-sends the tail of batch 1 (at-least-once)
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(20) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, (Long, Long)] =
      spark.table("dedupparity").as[KeyOutput[(Long, Long)]].collect()
        .groupBy(_.key)
        .map { case (k, rows) => k -> rows.maxBy(_.offset).state.get }
    q.stop()

    val ok = streamed == batch
    if (!ok) {
      val keys = (streamed.keySet ++ batch.keySet).toSeq.sorted
      keys.filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
        println(s"MISMATCH digest=$k stream=${streamed.get(k)} batch=${batch.get(k)}")
      }
      println(s"digests stream=${streamed.size} batch=${batch.size}")
    }
    spark.stop()
    val nDups = batch.count(_._2._1 > 1)
    println(s"DEDUP_PARITY_OK=$ok (${batch.size} digests, $nDups with duplicates)")
    sys.exit(if (ok) 0 else 1)
  }
}
