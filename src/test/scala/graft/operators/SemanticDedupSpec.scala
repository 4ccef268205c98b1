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

  test("zero vectors score 0 against everything and never crowd a top-k " +
    "head (0/0 = NaN sorts FIRST under desc without the guard)") {
    import spark.implicits._
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val emb = (Seq((0L, e1), (1L, v(e1, 0.01f, 3)), (2L, v(e1, 0.02f, 4))) :+
      ((9L, Array.fill(8)(0.0f)))) // the all-zero embedding (empty doc)
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 3)
      .select("cand_id", "rnk", "sim")
      .as[(Long, Int, Double)].collect().sortBy(_._2)
    // the zero vector is ranked LAST with sim exactly 0, never NaN-first
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 9L), out.mkString(","))
    assert(out.last._3 == 0.0 && !out.exists(_._3.isNaN))
  }

  test("chunk-LSH paths reject planes that break the 4-chunk split") {
    import spark.implicits._
    val emb = Seq((0L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    // planes < 4 -> 0-bit chunks -> ONE bucket -> full quadratic self-join
    intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.9, planes = 3)
    }
    // planes % 4 != 0 silently discards the top signature bits
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, emb, "vec_id", "embedding", 1, planes = 18)
    }
  }

  test("semanticDedup fails fast on a non-numeric id column") {
    import spark.implicits._
    val emb = Seq(("doc-1", Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val scores = Seq(("doc-1", 1L)).toDF("vec_id", "q")
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedup(emb, "vec_id", "embedding", scores, "q", 0.9)
    }
    assert(e.getMessage.contains("NUMERIC"))
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
