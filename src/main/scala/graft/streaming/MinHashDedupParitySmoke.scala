package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for NEAR-DUP (MinHash-LSH) INCREMENTAL DEDUP — the
  * production ingest shape: documents arrive over time, each new doc's
  * banded signature is folded per (band, bucket-hash) key through
  * [[KeyFlowTws]] against the seen-corpus state, and the candidate pairs
  * derivable from that state must equal the batch
  * [[graft.operators.Dedup.minhashLshPairs]] answer on the same corpus —
  * pair-set equality INCLUDING the per-pair signature-agreement estimate.
  *
  *  - batch truth: `minhashLshPairs` (the declared `q_minhash_lsh`
  *    operator) over sf0.001 documents plus planted near-duplicates
  *    (tail-token mutations — LSH must catch them, exact dedup cannot);
  *  - streaming: one record per (doc, band) keyed by the band's bucket
  *    hash, carrying the doc id + full signature; the per-bucket fold
  *    appends first-seen docs (value-level dedup on top of the engine's
  *    offset-replay guard), replayed across 4 microbatches with an
  *    at-least-once overlap; final bucket states reassemble into
  *    candidate pairs with the same positional-agreement estimate and
  *    threshold as the batch plan.
  *
  * The state the stream carries is exactly what an incremental deduper
  * needs at 100 TB: per-bucket doc lists are LSH-bounded (hot buckets are
  * the documented `dropHotBuckets` cap), signatures are `perms` longs —
  * state size tracks corpus novelty, not corpus bytes.
  *
  * Exits 0 iff the streamed pair set (with estimates) equals the batch
  * one. Forked by StreamBatchParitySpec (Spark 4.1 stateful exec NPEs
  * under sbt test — see TimerSmoke).
  */
object MinHashDedupParitySmoke {
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

    val (k, bands, rowsPerBand, minEstPpm) = (5, 16, 4, 500000L)
    val perms = bands * rowsPerBand

    // corpus: real docs + planted near-duplicates (id offset +1M, last
    // token mutated) so the parity claim covers actual matches
    val base = Tables(spark, dir, "documents").filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val planted = base.orderBy(col("doc_id")).limit(25)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat(col("text"), lit(" mutated-tail-token")).as("text"))
    val corpus = base.unionAll(planted)

    // ---- batch truth: the declared operator, estimates included
    val batch: Set[(Long, Long, Long)] =
      graft.operators.Dedup.minhashLshPairs(corpus, "doc_id", "text",
          k = k, bands = bands, rowsPerBand = rowsPerBand, minEstPpm = minEstPpm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // ---- feed: per-(doc, band) records keyed by the band bucket, built
    // with the SAME kernel + band-hash expressions as the batch plan
    val sigs = corpus.select(col("doc_id").as("doc"),
      graft.functions.MinHashSig(col("text"), k, perms).as("sig"))
    val bandRows = sigs.select(col("doc"), col("sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
        }: _*)).as("bb"))
      .select(col("doc"), col("bb.band"), col("bb.bh"), col("sig"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getSeq[Long](3)))
      .sortBy(t => (t._1, t._2)) // crawl order: by doc, then band
    val feed = bandRows.zipWithIndex.map { case ((doc, band, bh, sig), seq) =>
      Record("minhash", 0, seq.toLong, new Timestamp(0L), 0, s"$band:$bh",
        (doc.toString + "|" + sig.mkString(",")).getBytes("UTF-8"), Map.empty)
    }

    // per-bucket fold: append first-seen (doc, sig); value-level dedup on
    // top of the engine's offset-replay guard
    def parse(r: Record): (Long, Seq[Long]) = {
      val s = new String(r.value, "UTF-8").split("\\|", 2)
      (s(0).toLong, s(1).split(",").toSeq.map(_.toLong))
    }
    val fold = FoldOption.of[Seq[(Long, Seq[Long])], Record] { r =>
      Seq(parse(r))
    } { (st, r) =>
      val (doc, sig) = parse(r)
      if (st.exists(_._1 == doc)) st else st :+ ((doc, sig))
    }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("minhashparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("minhashparity").toString)
      .start()

    // 4 microbatches; batch 2 re-sends the tail of batch 1 (at-least-once)
    val quarters = (1 to 3).map(i => feed.length * i / 4)
    val b1 = feed.slice(0, quarters(0))
    val b2 = b1.takeRight(64) ++ feed.slice(quarters(0), quarters(1))
    val b3 = feed.slice(quarters(1), quarters(2))
    val b4 = feed.slice(quarters(2), feed.length)
    Seq(b1, b2, b3, b4).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val buckets: Seq[Seq[(Long, Seq[Long])]] =
      spark.table("minhashparity").as[KeyOutput[Seq[(Long, Seq[Long])]]]
        .collect().groupBy(_.key).toSeq
        .map { case (_, rows) => rows.maxBy(_.offset).state.get }
    q.stop()

    // ---- reassemble candidate pairs from the streamed bucket states with
    // the batch plan's exact estimate arithmetic (eq * 1e6 / perms, floor)
    def estPpm(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).count { case (x, y) => x == y } * 1000000L / perms
    val streamed: Set[(Long, Long, Long)] = buckets.flatMap { docs =>
      for {
        i <- docs.indices; j <- (i + 1) until docs.size
        (d1, s1) = docs(i); (d2, s2) = docs(j)
        lo = math.min(d1, d2); hi = math.max(d1, d2)
        est = estPpm(s1, s2) if est >= minEstPpm
      } yield (lo, hi, est)
    }.toSet

    val ok = streamed == batch && batch.nonEmpty
    if (!ok) {
      println(s"pairs stream=${streamed.size} batch=${batch.size}")
      (streamed -- batch).take(5).foreach(p => println(s"STREAM-ONLY $p"))
      (batch -- streamed).take(5).foreach(p => println(s"BATCH-ONLY $p"))
    }
    spark.stop()
    val plantedHits = batch.count { case (lo, hi, _) => hi - lo == 1000000L }
    println(s"MINHASH_DEDUP_PARITY_OK=$ok (${batch.size} pairs, " +
      s"$plantedHits planted near-dups recovered)")
    sys.exit(if (ok) 0 else 1)
  }
}
