package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-side IVF index: `nlist` centroid vectors. Tiny (nlist × dim
  * floats), so searches embed it as plan literals — see
  * [[Similarity.ivfSearch]].
  */
final case class IvfIndex(centroids: Array[Array[Float]])

object IvfIndex {
  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()

  /** Fit centroids on a bounded sample of the corpus. This is the
    * index-BUILD step: run once, keep the result ([[save]]/[[load]], or
    * reuse via [[getOrBuild]]); search never refits. KMeans quality needs a
    * representative sample, not the corpus — at 100 TB pass a
    * `sampleFraction` that yields ~`maxFitVectors` rows and the fit cost
    * becomes independent of corpus size.
    *
    * Reproducible by construction: BOTH reduction steps are content-
    * defined, never partition-layout-dependent — `sampleFraction` keeps a
    * vector iff its seeded content hash falls under the fraction (not
    * `sample()`, whose Bernoulli draw depends on partitioning), and the
    * `maxFitVectors` cap is a seed-stable exact top-K by content hash
    * (hash-threshold pre-cut to ~3K rows, then `orderBy(hash).limit(K)` —
    * see the build-body comment; K exceeds the planner's TakeOrdered
    * fallback threshold, so the uncut form would global-sort the corpus) —
    * so the same corpus always fits the same centroids regardless of
    * file splits. */
  def build(
      corpus: DataFrame, vecCol: String, nlist: Int, seed: Long,
      sampleFraction: Double = 1.0, maxFitVectors: Int = 100000): IvfIndex = {
    val h = pmod(xxhash64(col(vecCol), lit(seed)), lit(1000000L))
    val base =
      (if (sampleFraction < 1.0)
         corpus.filter(h < lit((sampleFraction * 1000000L).toLong))
       else corpus)
        .select(col(vecCol))
    val sampled = seedStableCap(base, vecCol, seed, maxFitVectors)
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(sampled)
    IvfIndex(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** The exact seed-stable top-`n` rows of `df` by ascending
    * `xxhash64(vecCol, seed)` — the fit-sample cap, package-visible so
    * the identity claim below is unit-tested (IvfCapSpec). Returns the
    * SAME rows as a bare `orderBy(hash).limit(n)` but never sorts more
    * than ~3n rows: above 3n input rows, a VALUE threshold on the sort
    * key (xxhash64 is uniform over the Long range) keeps a PREFIX of the
    * ascending-hash order that contains the true top-n with
    * overwhelming probability (binomial tail at n >= 10^5); a count
    * guard falls back to the uncut sort on a pathological shortfall, so
    * the selection is identical unconditionally and independent of file
    * splits (the threshold is pure arithmetic, not a sketch). Without
    * the cut, n above spark.sql.execution.topKSortFallbackThreshold
    * plans as a FULL-CORPUS range-partitioned global sort feeding a
    * single-partition limit — found by the r13 runtime plan sweep
    * inside KMeans.fit's construction-time subplan. */
  private[graft] def seedStableCap(
      base: DataFrame, vecCol: String, seed: Long, n: Int): DataFrame = {
    val ord = xxhash64(col(vecCol), lit(seed))
    val total = base.count()
    if (total <= 3L * n) base.orderBy(ord).limit(n)
    else {
      val frac = 3.0 * n / total
      val thr = (-9.223372036854776e18 + frac * 1.8446744073709552e19).toLong
      val cut = base.filter(ord <= lit(thr))
      (if (cut.count() >= n) cut else base).orderBy(ord).limit(n)
    }
  }

  /** Persist the fitted centroids as a tiny parquet (`centroid_id`,
    * `centroid`): at 100 TB the build is minutes of cluster time — a
    * driver restart must [[load]] it, not refit. `buildParams` (the
    * [[getOrBuild]] fingerprint) rides along on every row so a reload can
    * verify it is getting the index it asked for. */
  def save(spark: SparkSession, index: IvfIndex, path: String,
           buildParams: String = ""): Unit = {
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c, buildParams) }.toSeq
      .toDF("centroid_id", "centroid", "build_params")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load previously-[[save]]d centroids; None if nothing is stored at
    * `path`. Centroid order (= inverted-list ids) is restored exactly. */
  def load(spark: SparkSession, path: String): Option[IvfIndex] =
    loadWithParams(spark, path).map(_._1)

  /** [[load]] plus the stored build-params fingerprint (empty for stores
    * written before the fingerprint existed, or saved without one). */
  private def loadWithParams(
      spark: SparkSession, path: String): Option[(IvfIndex, String)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) None
    else {
      val df = spark.read.parquet(path).orderBy("centroid_id")
      val hasParams = df.columns.contains("build_params")
      val rows = (if (hasParams) df.select("centroid", "build_params")
                  else df.select("centroid")).collect()
      val idx = IvfIndex(rows.map(_.getSeq[Float](0).toArray))
      val params =
        if (hasParams && rows.nonEmpty) rows.head.getString(1) else ""
      Some((idx, params))
    }
  }

  /** Build-once-per-key: repeated queries against the same corpus reuse
    * the fitted centroids instead of refitting per invocation. The cache
    * key covers EVERY build parameter — two calls that would fit different
    * indexes never alias, and that holds for the DURABLE store too: the
    * fingerprint is saved with the centroids and validated on reload, so
    * a storePath holding an index built with different parameters (or a
    * pre-fingerprint store) fails loudly instead of silently searching
    * against the wrong centroids. */
  /** The build-parameter fingerprint [[getOrBuild]] stamps into durable
    * stores and validates on reload. Public so a manual [[build]]+[[save]]
    * that getOrBuild should later adopt can stamp the same string:
    * `save(spark, idx, path, IvfIndex.fingerprint(key, ...))`. */
  def fingerprint(key: String, vecCol: String, nlist: Int, seed: Long,
                  sampleFraction: Double = 1.0,
                  maxFitVectors: Int = 100000): String =
    s"$key|$vecCol|$nlist|$seed|$sampleFraction|$maxFitVectors"

  def getOrBuild(
      key: String, corpus: DataFrame, vecCol: String, nlist: Int, seed: Long,
      sampleFraction: Double = 1.0, maxFitVectors: Int = 100000,
      storePath: Option[String] = None): IvfIndex = {
    val fp = fingerprint(key, vecCol, nlist, seed, sampleFraction, maxFitVectors)
    cache.computeIfAbsent(
      s"$fp|${storePath.getOrElse("")}",
      _ => storePath.flatMap(p =>
        loadWithParams(corpus.sparkSession, p).map { case (idx, stored) =>
          require(stored == fp,
            s"IvfIndex store $p holds an index built with parameters " +
              s"'$stored', not '$fp' — pass a different storePath, delete " +
              "the stale store, or re-save it stamped with " +
              "IvfIndex.fingerprint(...) (refusing to silently search " +
              "against wrong centroids)")
          idx
        }).getOrElse {
        val built = build(corpus, vecCol, nlist, seed, sampleFraction, maxFitVectors)
        storePath.foreach(p => save(corpus.sparkSession, built, p, fp))
        built
      })
  }
}
