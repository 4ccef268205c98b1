package graft.operators

import org.apache.spark.sql.DataFrame
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
    * index-BUILD step: run once, keep the result (persist the centroid
    * arrays, or reuse via [[getOrBuild]]); search never refits. KMeans
    * quality needs a representative sample, not the corpus — at 100 TB
    * pass a `sampleFraction` that yields ~`maxFitVectors` rows and the fit
    * cost becomes independent of corpus size. */
  def build(
      corpus: DataFrame, vecCol: String, nlist: Int, seed: Long,
      sampleFraction: Double = 1.0, maxFitVectors: Int = 100000): IvfIndex = {
    val sampled =
      (if (sampleFraction < 1.0) corpus.sample(withReplacement = false, sampleFraction, seed)
       else corpus)
        .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
        .limit(maxFitVectors)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(sampled)
    IvfIndex(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Build-once-per-key: repeated queries against the same corpus reuse
    * the fitted centroids instead of refitting per invocation. */
  def getOrBuild(
      key: String, corpus: DataFrame, vecCol: String, nlist: Int, seed: Long,
      sampleFraction: Double = 1.0): IvfIndex =
    cache.computeIfAbsent(s"$key|$nlist|$seed",
      _ => build(corpus, vecCol, nlist, seed, sampleFraction))
}
