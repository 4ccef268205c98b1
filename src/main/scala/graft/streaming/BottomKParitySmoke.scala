package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for REPRODUCIBLE BOTTOM-K SAMPLING: the mergeable
  * native aggregate (graft.functions.BottomKByKey over xxhash64(doc_id) —
  * the declared `q_sample_bottomk`) maintained INCREMENTALLY per source
  * through the stateful surface. Bottom-k is exact and order-independent,
  * so the incremental sample after any prefix-complete replay must equal
  * the batch query bit-for-bit — the property that lets a streaming
  * ingest keep its audit sample current without ever recomputing it.
  *
  *  - batch: the declared q_sample_bottomk query at sf0.001;
  *  - streaming: one Record per document keyed by SOURCE (hot keys, like
  *    TokenStatsParitySmoke), state = the sorted bottom-k pair list,
  *    folded across 4 microbatches with a replay overlap — set-semantics
  *    insertion makes the fold idempotent under at-least-once delivery
  *    (same discipline as the batch aggregate, whose inputs are unique);
  *  - the per-key hash must be the SQL function's: XXH64.hashLong(id, 42).
  *
  * Exits 0 iff every source's (sort_key, doc_id) list matches. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object BottomKParitySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val K = 10 // local: an object field would drag the (non-serializable) smoke object into the fold closure
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // ---- batch truth: the declared query
    val batch: Map[String, List[(Long, Long)]] =
      graft.SparkEntry.queries("q_sample_bottomk")(spark, dir)
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1)
        .map { case (src, xs) => src -> xs.map(_._2).toList.sorted }

    // ---- streaming feed: one record per document, keyed by source
    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val feed = docs.zipWithIndex.map { case ((src, id), seq) =>
      Record("docs", 0, seq.toLong, new Timestamp(0L), 0, src,
        id.toString.getBytes("UTF-8"), Map.empty)
    }

    // the SQL xxhash64 over a LONG column (seed 42)
    def h(id: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L)

    // bottom-k fold: sorted pair list, set-dedup insertion, cap K
    def insert(st: List[(Long, Long)], id: Long): List[(Long, Long)] = {
      val pair = (h(id), id)
      if (st.contains(pair)) st
      else ((pair :: st).sorted).take(K)
    }
    val fold = FoldOption.of[List[(Long, Long)], Record] { r =>
      insert(Nil, new String(r.value, "UTF-8").toLong)
    } { (st, r) => insert(st, new String(r.value, "UTF-8").toLong) }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("bottomkparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bottomkparity").toString)
      .start()

    // 4 microbatches; batch 2 re-sends the tail of batch 1 (at-least-once)
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(30) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[String, List[(Long, Long)]] =
      spark.table("bottomkparity").as[KeyOutput[List[(Long, Long)]]]
        .collect().groupBy(_.key).toSeq
        .map { case (src, rows) => src -> rows.maxBy(_.offset).state.get.sorted }
        .toMap
    q.stop()

    val ok = streamed == batch
    if (!ok) {
      val srcs = (streamed.keySet ++ batch.keySet).toSeq.sorted
      srcs.filter(s => streamed.get(s) != batch.get(s)).take(5).foreach { s =>
        println(s"MISMATCH source=$s stream=${streamed.get(s)} batch=${batch.get(s)}")
      }
    }
    spark.stop()
    println(s"BOTTOMK_PARITY_OK=$ok (${batch.size} sources, k=$K)")
    sys.exit(if (ok) 0 else 1)
  }
}
