package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Truth for the mergeable-sketch vocabulary query (rows-only
  * q_vocab_sketch): the HLL union of per-slice sketches must equal the
  * single-pass sketch register-for-register (same lgK → same estimate),
  * and the estimate must sit inside the published error envelope for a
  * KNOWN planted cardinality. Deterministic — DataSketches HLL hashes
  * have no run-to-run randomness. */
class VocabSketchSpec extends SparkTestBase {

  test("union of per-slice sketches == single global sketch, exactly") {
    import spark.implicits._
    val rows = (0 until 30000).map(i => (s"src${i % 7}", s"tok${i % 4211}"))
    val df = rows.toDF("source", "w")
    val merged = df.groupBy("source")
      .agg(expr("hll_sketch_agg(w, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0).getLong(0)
    val global = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(w, 12))"))
      .collect()(0).getLong(0)
    assert(merged == global,
      s"sketch union ($merged) diverged from the single-pass sketch ($global)")
  }

  test("estimate lands inside the lgK=12 error envelope for a known cardinality") {
    import spark.implicits._
    val exact = 4211L
    val est = (0 until 30000).map(i => s"tok${i % 4211}").toDF("w")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(w, 12))"))
      .collect()(0).getLong(0)
    // rse ~ 1.04/sqrt(2^12) ~ 1.6%; 5% is a generous deterministic bound
    assert(math.abs(est - exact) * 1000000L / exact < 50000L,
      s"estimate $est too far from exact $exact")
  }
}
