package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-cluster truth for the SemDeDup operator: two tight clusters
  * plus a singleton; quality scores pick the survivor (NOT the min id),
  * ties break to the smallest id, singletons always survive. */
class SemanticDedupSpec extends SparkTestBase {

  private def v(base: Array[Float], eps: Float, d: Int) = {
    val a = base.clone(); a(d) = a(d) + eps; a
  }

  test("one survivor per cluster: best score wins, ties to min id, singletons kept") {
    import spark.implicits._
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(8)(i => if (i == 1) 1.0f else 0.0f)
    val emb = ((0 until 5).map(i => (i.toLong, v(e1, 0.01f * i, 3))) ++
      (10 until 15).map(i => (i.toLong, v(e2, 0.01f * i, 4))) ++
      Seq((20L, Array.tabulate(8)(i => if (i == 2) 1.0f else 0.0f))))
      .toDF("vec_id", "embedding")
    // cluster 0-4: id 3 has the top score; cluster 10-14: all tie at 50
    val scores = ((0L until 5L).map(i => (i, if (i == 3L) 90L else 10L)) ++
      (10L until 15L).map(i => (i, 50L)) ++ Seq((20L, 1L)))
      .toDF("vec_id", "quality_ppm")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        scores, "quality_ppm", minCosine = 0.9)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4))))
      .toMap
    assert(out.size == 11)
    // cluster 0-4 → component 0, size 5, survivor = id 3 (best score)
    (0L until 5L).foreach { i =>
      assert(out(i)._1 == 0L && out(i)._2 == 5L, s"vec $i labeling")
      assert(out(i)._3 == (i == 3L), s"vec $i kept flag")
    }
    // cluster 10-14 → component 10, all scores tie → min id 10 survives
    (10L until 15L).foreach { i =>
      assert(out(i)._1 == 10L && out(i)._2 == 5L, s"vec $i labeling")
      assert(out(i)._3 == (i == 10L), s"vec $i kept flag")
    }
    // singleton: own component, cluster of one, kept
    assert(out(20L) == ((20L, 1L, true)))
  }

  test("exactly one survivor per component, always") {
    import spark.implicits._
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val emb = (0 until 12).map(i => (i.toLong, v(e1, 0.005f * i, 5)))
      .toDF("vec_id", "embedding")
    val scores = (0L until 12L).map(i => (i, i % 3)).toDF("vec_id", "q")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
      scores, "q", minCosine = 0.9)
    val perComp = out.groupBy("component")
      .agg(sum(col("kept").cast("long")).as("n_kept"))
      .collect().map(_.getLong(1))
    assert(perComp.nonEmpty && perComp.forall(_ == 1L))
  }
}
