package graft.operators

import graft.SparkTestBase
import graft.operators.{TextAnalysis => TA}

/** BM25 must equal an INDEPENDENT Scala reimplementation of the published
  * integer formula (same replace-based tf, same floor divisions) on a
  * controlled corpus, and rank the way BM25 is supposed to: same tf in a
  * shorter doc scores higher (length penalty), repeated terms saturate
  * instead of growing linearly (what raw tf·idf gets wrong). */
class RetrievalSpec extends SparkTestBase {

  // the operators' occurrence primitive, re-derived independently:
  // non-overlapping left-to-right literal replace, exactly SQL replace()
  private def occ(text: String, w: String): Long = {
    val p = s" $text "
    val needle = s" $w "
    ((p.length - p.replace(needle, "").length) / needle.length).toLong
  }
  private def dl(text: String): Long = text.count(_ == ' ').toLong + 1L

  private def refBm25(corpus: Seq[(Long, String)], terms: Seq[String],
                      k1m: Long = 1200L, bm: Long = 750L): Map[Long, Long] = {
    val n = corpus.size.toLong
    val a = math.max(corpus.map { case (_, t) => dl(t) }.sum / n, 1L)
    val dfs = terms.map(w => math.max(corpus.count(d => occ(d._2, w) > 0).toLong, 1L))
    corpus.map { case (id, text) =>
      val d = dl(text)
      val score = terms.zip(dfs).map { case (w, df) =>
        val tf = occ(text, w)
        val num = tf * (1000L + k1m) * 1000000L * a
        val den = math.max(tf * 1000000L * a + k1m * ((1000L - bm) * a + bm * d), 1L)
        ((n * 1000000L) / df) * (num / den) / 1000L
      }.sum
      id -> score
    }.toMap
  }

  private val corpus = Seq(
    1L -> "query one two three four five six seven eight nine ten eleven",
    2L -> "query one two",
    3L -> "query query query query query query query query one",
    4L -> "plain filler text with no hits at all",
    5L -> "table query mixed",
    6L -> "")

  test("bm25Search equals the independent integer reference on every doc") {
    import spark.implicits._
    val out = TA.bm25Search(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq("query", "table"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = refBm25(corpus, Seq("query", "table"))
    assert(out.size == corpus.size)
    corpus.foreach { case (id, _) => assert(out(id) == ref(id), s"doc $id") }
  }

  test("bm25 ranking: length penalized, tf saturating, misses at zero") {
    import spark.implicits._
    val out = TA.bm25Search(corpus.toDF("doc_id", "text"), "doc_id", "text",
      Seq("query"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same tf (1), shorter doc wins: doc2 (dl 3) > doc1 (dl 12)
    assert(out(2L) > out(1L))
    // tf saturation: doc3 has 4x the tf of doc2 (replace-based counting
    // halves adjacent repeats) on a longer doc — it wins, but by far
    // less than 4x (raw tf*idf would scale linearly)
    assert(out(3L) > out(2L) && out(3L) < out(2L) * 4)
    // no hits -> exactly 0
    assert(out(4L) == 0L && out(6L) == 0L)
  }

  test("rrfFuse: hand-computed fusion, overlap boosted, absent docs contribute nothing") {
    import spark.implicits._
    // list A ranks 1,2,3 -> docs 10,11,12; list B ranks 1,2 -> docs 12,13
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rnk")
    val b = Seq((12L, 1L), (13L, 2L)).toDF("id", "rnk")
    val out = TA.rrfFuse(Seq(a, b), "id", "rnk", k0 = 60L, topK = 10)
      .select("id", "rrf_ppm", "n_lists")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def c(r: Long) = 1000000L / (60L + r)
    assert(out(10L) == ((c(1), 1L)))
    assert(out(11L) == ((c(2), 1L)))
    assert(out(12L) == ((c(3) + c(1), 2L))) // in both lists: contributions add
    assert(out(13L) == ((c(2), 1L)))
    // the overlap doc outranks every single-list doc
    val top = TA.rrfFuse(Seq(a, b), "id", "rnk", 60L, 1)
      .select("id").as[Long].head()
    assert(top == 12L)
  }

  test("keywordSearch and bm25Search agree on WHICH docs match, not on order") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val kw = TA.keywordSearch(df, "doc_id", "text", Seq("query"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bm = TA.bm25Search(df, "doc_id", "text", Seq("query"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kw.keys == bm.keys)
    corpus.foreach { case (id, _) =>
      assert((kw(id) > 0) == (bm(id) > 0), s"doc $id hit/miss parity") }
  }
}
