package graft.operators

import graft.SparkTestBase
import graft.functions.AdjacentJoin
import org.apache.spark.sql.functions._

/** Hand-computed truth table for the collocation operator and its
  * adjacent-pair kernel. Corpus: d1 = "big data big data big",
  * d2 = "data lake" →
  *   unigrams big=3 data=3 lake=1, N=7;
  *   bigrams "big data"=2, "data big"=2, "data lake"=1;
  *   lift_ppm = (((1e6*c_xy) div c_x) * N) div c_y. */
class CollocationSpec extends SparkTestBase {

  test("adjacent_join kernel: pairs, boundaries, null slots") {
    import spark.implicits._
    def pairs(a: Seq[String]): Seq[String] =
      Seq(Tuple1(a)).toDF("a")
        .select(AdjacentJoin(col("a"), " ").as("p"))
        .collect()(0).getSeq[String](0)
    assert(pairs(Seq("a", "b", "c")) == Seq("a b", "b c"))
    assert(pairs(Seq("solo")) == Seq.empty)
    assert(pairs(Seq.empty) == Seq.empty)
    assert(pairs(Seq("a", null, "c")) == Seq.empty) // null slots yield no pair
    assert(pairs(Seq("a", "a")) == Seq("a a"))
  }

  test("collocations: counts, lift, deterministic order, top-k bound") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big data big data big"),
      (2L, "data lake"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "doc_id", "text", k = 2)
      .orderBy(col("c_xy").desc, col("bigram"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // lift("big data") = ((2000000 div 3) * 7) div 3 = (666666*7) div 3 = 1555554
    assert(out.toSeq == Seq(
      ("big data", 2L, 3L, 3L, 1555554L),
      ("data big", 2L, 3L, 3L, 1555554L))) // k=2 bound: "data lake" cut
  }

  test("collocations: hapax pair gets the maximal lift of its counts") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "doc_id", "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // each pair: ((1e6*1) div 1) * 3 div 1 = 3000000 (observed 3x expectation)
    assert(out == Map("alpha beta" -> 3000000L, "beta gamma" -> 3000000L))
  }
}
