package graft

import graft.operators.Corpus

/** Systematic PPS sampling truth table + conservation on real data. */
class PpsSampleSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed draw: step 10, offset 5, multiplicities by mass") {
    // masses 10,1,1,88 -> total 100, n=10 -> step 10, positions 5,15,...,95
    val df = Seq((1L, 10L), (2L, 1L), (3L, 1L), (4L, 88L)).toDF("id", "sz")
    val got = Corpus.ppsSample(df, "id", "sz", 10L, buckets = 2)
      .select("id", "multiplicity").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc1 [0,10) holds position 5; docs 2,3 hold none; doc4 [12,100)
    // holds 15..95 = 9 positions
    assert(got === Map(1L -> 1L, 4L -> 9L))
    assert(got.values.sum === 10L)
  }

  test("total smaller than n clamps the step to 1 (every unit drawn)") {
    val df = Seq((1L, 2L), (2L, 3L)).toDF("id", "sz")
    val got = Corpus.ppsSample(df, "id", "sz", 100L, buckets = 1)
      .select("id", "multiplicity").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 3L)) // step 1, offset 0: every position
  }

  test("zero/null sizes never participate") {
    val df = Seq((1L, Some(10L)), (2L, Some(0L)), (3L, Option.empty[Long]))
      .toDF("id", "sz")
    val ids = Corpus.ppsSample(df, "id", "sz", 5L, buckets = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("conservation on sf0.001 documents: sum of multiplicities = positions under total") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "n_chars")
    val n = 37L
    val total = docs.filter($"n_chars" > 0)
      .agg(org.apache.spark.sql.functions.sum("n_chars")).head().getLong(0)
    val step = math.max(total / n, 1L)
    val off = step / 2
    val expectedDraws = if (total <= off) 0L else (total - 1 - off) / step + 1
    val drawn = Corpus.ppsSample(docs, "doc_id", "n_chars", n)
      .agg(org.apache.spark.sql.functions.sum("multiplicity")).head().getLong(0)
    assert(drawn === expectedDraws)
    // partitioning independence
    val drawn1 = Corpus.ppsSample(docs, "doc_id", "n_chars", n, buckets = 1)
      .agg(org.apache.spark.sql.functions.sum("multiplicity")).head().getLong(0)
    assert(drawn1 === drawn)
  }
}
