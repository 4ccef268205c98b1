package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity #2 for the LLM-pipeline suite: INCREMENTAL TOKEN
  * ACCOUNTING. `q_token_stats` is the per-source data-budget report
  * (n_docs, total BPE-ish tokens, total chars); a streaming ingest
  * pipeline maintains exactly that ledger incrementally so mix design can
  * read budgets while the crawl is still landing. This smoke proves the
  * running ledger equals the batch aggregate bit-for-bit.
  *
  *  - batch: the declared `q_token_stats` aggregation over sf0.001
  *    documents;
  *  - streaming: the same docs replayed through [[KeyFlowTws]] keyed by
  *    SOURCE (a low-cardinality hot-key state, the opposite regime of
  *    DedupParitySmoke's per-digest keys), folding (n_docs, n_tokens,
  *    n_chars) across 4 microbatches with a replay overlap so the
  *    at-least-once offset-dedup guard participates.
  *
  * The fold counts tokens with the same regex the declared query uses
  * (`[a-z]+|[0-9]+|[^a-z0-9 ]` — TextAnalysis.bpeTokenCount); both sides
  * run Java regex semantics, so equality is exact, not approximate.
  *
  * Exits 0 iff every source's ledger matches batch. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object TokenStatsParitySmoke {
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

    // ---- batch truth: the declared q_token_stats aggregation
    val batch: Map[String, (Long, Long, Long)] =
      Tables(spark, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.operators.TextAnalysis.bpeTokenCount(col("text"))).as("t"),
          sum(length(col("text")).cast("long")).as("c"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap

    // ---- streaming: replay keyed by source, offset = doc id (unique).
    // Null text rides as empty bytes: the batch SUMs skip the null row
    // (add nothing) while n_docs still counts it — the empty-string
    // measure (1, 0, 0) reproduces exactly that.
    val feed = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => Record("documents", 0, r.getLong(0), new Timestamp(0L), 0,
        r.getString(1),
        (if (r.isNullAt(2)) "" else r.getString(2)).getBytes("UTF-8"), Map.empty))
      .sortBy(_.offset)

    // local vals only: the fold closure ships to executors, and a method
    // reference would drag this (non-serializable) object along with it.
    // Char count = CODE POINTS (Spark's length()), not UTF-16 units —
    // String.length would diverge on any non-BMP char.
    val tokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val measure: Record => (Long, Long, Long) = { r =>
      val t = new String(r.value, "UTF-8")
      (1L, tokenRe.findAllIn(t).size.toLong,
        t.codePointCount(0, t.length).toLong)
    }
    val fold = FoldOption.of[(Long, Long, Long), Record](measure) { (st, r) =>
      val m = measure(r)
      (st._1 + m._1, st._2 + m._2, st._3 + m._3)
    }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("tokenparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tokenparity").toString)
      .start()

    // 4 microbatches; batch 2 re-sends the tail of batch 1 (at-least-once)
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(15) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, (Long, Long, Long)] =
      spark.table("tokenparity").as[KeyOutput[(Long, Long, Long)]].collect()
        .groupBy(_.key)
        .map { case (k, rows) => k -> rows.maxBy(_.offset).state.get }
    q.stop()

    val ok = streamed == batch
    if (!ok) {
      val keys = (streamed.keySet ++ batch.keySet).toSeq.sorted
      keys.filter(k => streamed.get(k) != batch.get(k)).take(5).foreach { k =>
        println(s"MISMATCH source=$k stream=${streamed.get(k)} batch=${batch.get(k)}")
      }
      println(s"sources stream=${streamed.size} batch=${batch.size}")
    }
    spark.stop()
    println(s"TOKEN_PARITY_OK=$ok (${batch.size} sources, " +
      s"${batch.valuesIterator.map(_._1).sum} docs)")
    sys.exit(if (ok) 0 else 1)
  }
}
