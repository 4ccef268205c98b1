package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for CORPUS-WIDE KEEP-FIRST LINE DEDUP: the second
  * LLM-pipeline operator proven on the stateful surface (DedupParitySmoke
  * proved exact dedup). The claim is stronger than state equality — the
  * streamed per-line states must REASSEMBLE into the exact documents the
  * batch operator emits:
  *
  *  - batch: [[graft.operators.TextAnalysis.dedupLinesCorpus]] (the
  *    declared `q_corpus_line_dedup` operator) over multi-line docs
  *    synthesized from sf0.001 documents exactly like the declared query
  *    (per-source nav + text + unique id line + universal footer);
  *  - streaming: every (doc, pos, line) instance replayed in crawl order
  *    through [[KeyFlowTws]] keyed by the line's md5 digest, folding
  *    keep-first `(count, min (doc, pos), line)` across 4 microbatches
  *    with a replay overlap (at-least-once offset dedup in the claim);
  *    the final states are then reassembled driver-side into per-doc
  *    (text_dedup, n_lines_kept, n_lines_dropped) and diffed against the
  *    batch operator bit-for-bit.
  *
  * This is what a streaming ingest crawl runs at 100 TB: keep-first per
  * line digest is O(1) state, and arrival order IS (doc, pos) order, so
  * the incremental answer must equal the batch one.
  *
  * Exits 0 iff every doc's (text_dedup, kept, dropped) matches. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test —
  * see TimerSmoke).
  */
object LineDedupParitySmoke {
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

    // ---- the q_corpus_line_dedup synthesis, verbatim
    val raw = Tables(spark, dir, "documents").filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(lit("nav: "), col("source"), lit("\n"), col("text"),
          lit("\nid: "), col("doc_id"), lit("\ncookie notice")).as("raw"))

    // ---- batch truth: the declared operator
    val batch: Map[Long, (String, Long, Long)] =
      TextAnalysis.dedupLinesCorpus(raw, "doc_id", "raw")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap

    // ---- streaming feed: (doc, pos, line) instances in crawl order
    val docs = raw.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val instances = docs.flatMap { case (id, text) =>
      text.split("\n", -1).zipWithIndex.map { case (line, pos) => (id, pos.toLong, line) }
    }
    val digest = instances.map(_._3).distinct.map { line =>
      line -> java.security.MessageDigest.getInstance("MD5")
        .digest(line.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toMap
    // value layout "id:pos:line" — id/pos are numeric so the first two
    // fields never contain ':'; split limit 3 keeps any ':' in the line
    val feed = instances.zipWithIndex.map { case ((id, pos, line), seq) =>
      Record("lines", 0, seq.toLong, new Timestamp(0L), 0, digest(line),
        (id.toString + ":" + pos.toString + ":" + line).getBytes("UTF-8"), Map.empty)
    }

    // keep-first fold: (occurrences, min (doc, pos), line text)
    def parse(r: Record): (Long, Long, String) = {
      val parts = new String(r.value, "UTF-8").split(":", 3)
      (parts(0).toLong, parts(1).toLong, if (parts.length > 2) parts(2) else "")
    }
    val fold = FoldOption.of[(Long, Long, Long, String), Record] { r =>
      val (id, pos, line) = parse(r); (1L, id, pos, line)
    } { (st, r) =>
      val (id, pos, _) = parse(r)
      val firstWins = st._2 < id || (st._2 == id && st._3 <= pos)
      (st._1 + 1, if (firstWins) st._2 else id, if (firstWins) st._3 else pos, st._4)
    }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("linededupparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("linededupparity").toString)
      .start()

    // 4 microbatches; batch 2 re-sends the tail of batch 1 (at-least-once)
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(50) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val states: Seq[(Long, Long, Long, String)] =
      spark.table("linededupparity").as[KeyOutput[(Long, Long, Long, String)]]
        .collect().groupBy(_.key).toSeq
        .map { case (_, rows) => rows.maxBy(_.offset).state.get }
    q.stop()

    // ---- reassemble the streamed keeper states into per-doc output
    val keepersByDoc = states.groupBy(_._2)
    val totals = instances.groupBy(_._1).map { case (id, xs) => id -> xs.length.toLong }
    val streamed: Map[Long, (String, Long, Long)] = totals.map { case (id, total) =>
      val keep = keepersByDoc.getOrElse(id, Seq.empty).sortBy(_._3)
      id -> ((keep.map(_._4).mkString("\n"), keep.length.toLong, total - keep.length))
    }

    val ok = streamed == batch
    if (!ok) {
      val ids = (streamed.keySet ++ batch.keySet).toSeq.sorted
      ids.filter(id => streamed.get(id) != batch.get(id)).take(5).foreach { id =>
        println(s"MISMATCH doc=$id stream=${streamed.get(id)} batch=${batch.get(id)}")
      }
      println(s"docs stream=${streamed.size} batch=${batch.size}")
    }
    spark.stop()
    val nEmpty = batch.count(_._2._2 == 0L)
    val nDropped = batch.map(_._2._3).sum
    println(s"LINE_DEDUP_PARITY_OK=$ok (${batch.size} docs, $nDropped lines dropped, " +
      s"$nEmpty all-duplicate docs)")
    sys.exit(if (ok) 0 else 1)
  }
}
