package graft.streaming

import graft.fold.FoldOption
import graft.model.Record
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Stream↔batch parity for the CLUSTER CONTRACT (r14 stretch, judge #8) —
  * the streaming twin of [[graft.operators.Dedup.autoClusters]], the
  * linear-output production dedup path. The state an incremental
  * cluster-dedup ingest maintains at 100 TB is exactly what this smoke
  * folds through [[KeyFlowTws]]: per LSH band bucket, the member set up
  * to the documented `autoBucketCap` (beyond which the bucket is dead —
  * the dropHotBuckets discipline — so per-key state is bounded by the
  * cap, never by the corpus).
  *
  *  - batch truth: `Dedup.autoClusters` (the declared
  *    `q_dedup_auto_clusters` operator) over a planted corpus with two
  *    mutual near-dup mega-clusters, an over-cap boilerplate group (170
  *    identical docs — every band bucket exceeds the 160 cap, so the
  *    cap discipline itself is part of the parity claim), and noise
  *    singletons, all in ONE over-cap block so the hot star-edge leg
  *    carries everything;
  *  - streaming: one record per (doc, band) keyed by the band's bucket
  *    hash — banding built with the SAME MinHashSig kernel + band-hash
  *    expressions as the batch plan — folded across 4 microbatches with
  *    an at-least-once replay overlap; final bucket states reassemble
  *    into star edges (bucket-min → member), which run through the SAME
  *    exact-verify kernel ([[Dedup.verifyStarEdges]], the seam
  *    autoClusters' hot leg itself calls) and the same
  *    connectedComponents + label-attach tail.
  *
  * Exits 0 iff the final (doc → cluster) label map is BIT-EXACT equal to
  * the batch operator's, every mega-cluster links, and every boilerplate
  * doc stays a singleton (the cap fired on both sides). Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test —
  * see TimerSmoke).
  */
object ClusterParitySmoke {

  /** Per-bucket state: distinct-member count and the member list, cleared
    * once the count passes the cap (the bucket is dead either way; the
    * count keeps growing so a replayed overlap can't resurrect it). */
  final case class Bucket(n: Long, members: Seq[Long])

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

    val (k, bands, rowsPerBand) = (3, 16, 4)
    val perms = bands * rowsPerBand
    val minPpm = 900000L
    val maxBlockPopulation = 20L
    val cap = Dedup.autoBucketCap(maxBlockPopulation) // 160

    // ---- planted corpus: two mutual mega-clusters, one over-cap
    // boilerplate group, noise — one block, everything hot
    val megaA = (1L to 30L).map(i =>
      i -> ("the quick brown fox jumps over the lazy dog again and again " +
        s"with shared boilerplate marker ${i % 2}"))
    val megaB = (31L to 60L).map(i =>
      i -> ("an entirely different second mega cluster about spark physical " +
        s"plans and shuffle exchanges variant ${i % 2}"))
    val noise = (201L to 205L).map(i =>
      i -> s"unrelated hot-block text q$i r$i s$i t$i u$i v$i w$i x$i y$i z$i")
    val boiler = (401L to 570L).map(i => // 170 identical > cap 160
      i -> "boilerplate cookie banner accept all cookies to continue reading")
    val all = megaA ++ megaB ++ noise ++ boiler
    val corpus = spark.createDataFrame(all).toDF("doc_id", "text")
      .withColumn("blk", lit(0))

    // ---- batch truth: the declared operator
    val batch: Map[Long, Long] = Dedup.autoClusters(corpus, "doc_id", "text",
        Seq("blk"), k = k, minPpm = minPpm,
        maxBlockPopulation = maxBlockPopulation,
        bands = bands, rowsPerBand = rowsPerBand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // ---- feed: per-(doc, band) records keyed by the band bucket, built
    // with the SAME kernel + band-hash expressions as the batch plan
    val bandRows = corpus.select(col("doc_id").as("doc"),
        graft.functions.MinHashSig(col("text"), k, perms).as("sig"))
      .select(col("doc"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bh"))
        }: _*)).as("bb"))
      .select(col("doc"), col("bb.band"), col("bb.bh"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)) // crawl order: by doc, then band
    val feed = bandRows.zipWithIndex.map { case ((doc, band, bh), seq) =>
      Record("clusters", 0, seq.toLong, new Timestamp(0L), 0, s"$band:$bh",
        doc.toString.getBytes("UTF-8"), Map.empty)
    }

    // per-bucket fold: append first-seen docs (value-level dedup on top of
    // the engine's offset-replay guard); past the cap the member list is
    // cleared and only the count grows — bounded state, dead bucket
    def docOf(r: Record): Long = new String(r.value, "UTF-8").toLong
    val fold = FoldOption.of[Bucket, Record] { r =>
      Bucket(1L, Seq(docOf(r)))
    } { (st, r) =>
      val d = docOf(r)
      if (st.members.contains(d) && st.n <= cap) st
      else {
        val n = st.n + 1
        if (n > cap) Bucket(n, Seq.empty) else Bucket(n, st.members :+ d)
      }
    }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("clusterparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("clusterparity").toString)
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

    val buckets: Seq[Bucket] =
      spark.table("clusterparity").as[KeyOutput[Bucket]]
        .collect().groupBy(_.key).toSeq
        .map { case (_, rows) => rows.maxBy(_.offset).state.get }
    q.stop()

    // ---- reassemble star edges from the streamed bucket states: alive
    // buckets (n <= cap) emit min -> member, exactly bandStarEdges'
    // contract; then the SAME verify + CC + attach tail as the batch op
    val starEdges = buckets.flatMap { b =>
      if (b.n > cap || b.members.size < 2) Nil
      else {
        val m = b.members.min
        b.members.filterNot(_ == m).map(d => (m, d))
      }
    }.distinct
    val starDf = spark.createDataFrame(starEdges).toDF("doc1", "doc2")
    val verified = Dedup.verifyStarEdges(corpus, "doc_id", "text",
      starDf, k, minPpm, packedAscii = true)
    val labels = Dedup.connectedComponents(verified, "doc1", "doc2")
    val streamed: Map[Long, Long] = corpus.select(col("doc_id").as("doc"))
      .join(labels.withColumnRenamed("node", "doc").hint("shuffle_hash"),
        Seq("doc"), "left")
      .select(col("doc"), coalesce(col("comp"), col("doc")).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val ids = all.map(_._1)
    val megaALinked = (1L to 30L).map(streamed).distinct.size == 1
    val megaBLinked = (31L to 60L).map(streamed).distinct.size == 1
    val boilerSingletons = (401L to 570L).forall(i => streamed(i) == i)
    val ok = streamed == batch && streamed.keySet == ids.toSet &&
      megaALinked && megaBLinked && boilerSingletons
    if (!ok) {
      println(s"labels stream=${streamed.size} batch=${batch.size} " +
        s"megaA=$megaALinked megaB=$megaBLinked boilerSingle=$boilerSingletons")
      ids.filter(i => streamed.get(i) != batch.get(i)).take(8).foreach { i =>
        println(s"MISMATCH doc=$i stream=${streamed.get(i)} batch=${batch.get(i)}")
      }
    }
    spark.stop()
    val nClusters = batch.values.toSet.size
    println(s"CLUSTER_PARITY_OK=$ok (${batch.size} docs, $nClusters clusters, " +
      s"cap=$cap fired on ${170} boilerplate docs)")
    sys.exit(if (ok) 0 else 1)
  }
}
