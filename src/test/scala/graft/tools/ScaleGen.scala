package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the SCALING.md wall-time curves:
  * replicates the three tables the flagship operators consume
  * (`documents`, `lineitem`, `orders`) FACTOR times with id offsets, and
  * symlinks every other table, producing a directory WarmBench can point
  * at. Seeded by construction — replica k's mutation depends only on k.
  *
  * The replication preserves LINEAR pair structure (the property that
  * makes wall-time-vs-size slopes meaningful):
  *
  *  - `lang` gets a per-replica suffix, so the lang-blocked demo paths
  *    (q_dedup_ngram, q_containment) can never pair across replicas —
  *    their within-block quadratic structure repeats exactly F times;
  *  - replica k > 0 rewrites the three most frequent letters (e, t, a) to
  *    replica-unique characters via `translate` — CONTENT-KEYED, so every
  *    intra-replica duplicate relation (exact dups, shared spans, shingle
  *    similarity) is preserved bit-for-bit, while across replicas any
  *    char-5-gram containing e/t/a differs: cross-replica 5-gram Jaccard
  *    drops to ~(1-0.24)^5/(2-(1-0.24)^5) ≈ 0.14, far below q_minhash_lsh's
  *    0.4 estimate floor and band-collision range (J^4 per band ≈ 4e-4),
  *    and no 50-char span survives — pair structure is linear in F by
  *    construction. (A first attempt inserted a replica token every 4th
  *    word: that breaks word shingles but leaves most CHAR 5-grams
  *    shared, and the kernels shingle by characters — cross-replica
  *    candidates leaked quadratically, measured super-linear at x30.)
  *  - `n_chars` keeps the BASE value (the map is 1:1 anyway) so
  *    length-band blocking groups the same docs in every replica;
  *  - lineitem replicates with per-replica orderkey/suppkey offsets (the
  *    co-supply graph becomes F disjoint copies: |E| scales by F, per-node
  *    degree is constant); orders with custkey/orderkey offsets (F times
  *    the customers at the same per-customer order count).
  *
  * Factors that exhaust the disjoint-TRIPLE pool switch to a
  * SINGLE-letter rewrite (only `e` → replica-unique target): ~0.2% of
  * 50-char grams contain no `e` and stay shared across replicas, which
  * is fine for the per-occurrence-linear span queries and irrelevant for
  * lang-blocked or pair-free queries, but ~53% of 5-char grams survive —
  * LSH/minhash/shingle queries are NOT scale-measurable on a single-mode
  * corpus (the tool prints a warning). Since r13 the target pool extends
  * into the BMP Latin letter blocks, so triple mode holds to factor ~195
  * and single mode is no longer reachable in practice (the pre-r13 bound
  * was 31, which forced the original x90 runs of q_budget_select /
  * q_substring_dup_fast / q_dedup_ngram onto single mode — those three
  * are single-mode-valid classes, so the recorded rows stand).
  *
  * Usage: Test/runMain graft.tools.ScaleGen <srcDir> <outDir> <factor> [tables]
  * `tables` = comma list of the replicated tables to actually build
  * (default documents,lineitem,orders) — an x90 documents-only corpus
  * need not pay for 54M lineitem rows it will never read.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = args(2).toInt
    val wanted = args.lift(3).map(_.split(",").map(_.trim).toSet)
      .getOrElse(Set("documents", "lineitem", "orders"))
    require(factor >= 1, "factor must be >= 1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))

    def replicate(name: String)(mutate: (DataFrame, Int) => DataFrame): Unit = {
      if (!wanted(name)) return
      val base = spark.read.parquet(s"$src/$name.parquet")
      val all = (0 until factor).map(k => mutate(base, k)).reduce(_ unionAll _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name x$factor -> ${all.count()} rows")
    }

    // target pool for the e/t/a rewrite: printable ASCII EXCLUDING the
    // replaced letters themselves (a no-op mapping would leave a replica
    // sharing grams with replica 0) and space (word structure preserved).
    // Replica k takes the DISJOINT CONTIGUOUS TRIPLE at pool offset
    // 3(k-1), so no two replicas share ANY target, across letters too —
    // strided schemes (k, k+20, k+40 mod |pool|) wrap for k >= 21 and
    // collide CROSS-letter (one replica's a-target equals another's
    // e-target: "ga" there equals "ge" here), quietly re-opening
    // cross-replica gram sharing the slope table assumes is excluded.
    // Sharing even one target leaves all grams without the other letters
    // equal across those replicas, and cross-replica Jaccard climbs back
    // into LSH range. Alphanumerics first (replicas <= 20 keep word-ish
    // targets), punctuation extends the pool to 91; r13 appends the BMP
    // Latin-1/Extended letter blocks (U+00C0-U+02AF minus the two
    // arithmetic signs) — single UTF-16 units, absent from the ASCII
    // corpus, 1:1 under translate, so triple mode (the only mode that
    // preserves LINEAR pair structure for shingle/LSH queries) now holds
    // to factor ~195 and the x90 LSH/minhash points are honestly
    // measurable (pre-r13 the bound was 31 and x90 fell back to the
    // single-letter rewrite, which the tool itself flags as not
    // pair-structure-preserving). The shingle kernels are case- and
    // locale-agnostic (raw char xxhash, no lower()), so non-ASCII
    // targets change nothing but identity.
    val pool = (('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z') ++
      ('!' to '/') ++ (':' to '@') ++ ('[' to '`') ++ ('{' to '~') ++
      ('À' to 'ʯ'))
      .filterNot("eta×÷".contains(_))
    val singleMode = 3 * (factor - 1) > pool.size
    if (singleMode) {
      require(factor - 1 <= pool.size,
        s"factor $factor needs ${factor - 1} distinct single targets; the " +
          s"replica-unique pool has ${pool.size}")
      println(s"[scalegen] WARNING: factor $factor exceeds the triple pool " +
        "and uses the SINGLE-letter (e) rewrite — ~53% of 5-char grams " +
        "stay shared across replicas, so LSH/minhash/shingle queries are " +
        "NOT scale-measurable on this corpus (valid: per-occurrence-" +
        "linear, lang-blocked, pair-free).")
    } else require(3 * (factor - 1) <= pool.size,
      s"factor $factor needs ${3 * (factor - 1)} distinct targets; the " +
        s"replica-unique pool has ${pool.size}")
    replicate("documents") { (df, k) =>
      if (k == 0) df
      else {
        val (from, targets) =
          if (singleMode) ("e", pool(k - 1).toString)
          else ("eta", "" + pool(3 * (k - 1)) + pool(3 * (k - 1) + 1) +
            pool(3 * (k - 1) + 2))
        df.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          translate(col("text"), from, targets).as("text"),
          concat(col("lang"), lit(s"-r$k")).as("lang"),
          col("source"),
          col("n_chars")) // base value: same length bands in every replica
      }
    }
    replicate("lineitem") { (df, k) =>
      if (k == 0) df
      else df
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * 1000000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k * 10000000L))
        // partkey offset keeps the co-PURCHASE graph (q_triangles) F
        // disjoint copies too — without it every replica stacks weight
        // onto the SAME part-pair edge, the w>=2 threshold admits all
        // base-weight-1 pairs and the edge set explodes super-linearly
        // (measured 16x time at x3). Queries joining the symlinked `part`
        // dim are NOT scale-measurable on these corpora (replica partkeys
        // have no dim rows); none of the SCALING.md queries do.
        .withColumn("l_partkey", col("l_partkey") + lit(k * 10000000L))
    }
    replicate("orders") { (df, k) =>
      if (k == 0) df
      else df
        .withColumn("o_orderkey", col("o_orderkey") + lit(k * 1000000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(k * 100000000L))
    }

    // symlink everything else so any query resolves
    val srcDir = new java.io.File(src)
    srcDir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val link = java.nio.file.Paths.get(out, f.getName)
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link, f.toPath.toAbsolutePath)
    }
    println(s"[scalegen] done: $out (factor $factor)")
    spark.stop()
  }
}
