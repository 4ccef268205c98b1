package graft.operators

import graft.SparkTestBase
import graft.functions.{MinHashSig, SimHashText}
import org.apache.spark.sql.functions._

/** The single-scan profile must be column-identical to the per-signal
  * operators it fuses (those are the oracle-proven trees), including on
  * edge-case texts; and the `signatures = true` variant must match the
  * dedup signature kernels it appends. */
class ProfileSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox and the lazy dog of the yard"),
      (2L, "der hund und die katze und der vogel"),
      (3L, ""),                          // empty text
      (4L, "aaaaaaaaaaaaaaaaaaaaaaaa"),  // degenerate repetition
      (5L, "héllo wörld — 日本語 text"),  // multi-byte chars
      (6L, "a"),                         // shorter than every k
      (7L, null.asInstanceOf[String]))   // null text
      .toDF("doc_id", "text")
  }

  test("profile fuses the per-signal columns bit-identically") {
    val t = col("text")
    val expected = corpus.select(
      col("doc_id"),
      length(t).cast("long").as("n_chars_calc"),
      TextAnalysis.tokenCount(t).as("n_tokens"),
      TextAnalysis.bpeTokenCount(t).as("n_tokens_bpe"),
      TextAnalysis.punctCount(t).as("n_punct"),
      TextAnalysis.qualityScorePpm(t).as("quality_ppm"),
      TextAnalysis.langId(t).as("lang_pred"),
      TextAnalysis.fingerprint(t).as("fp"),
      TextAnalysis.minShingleFingerprint(t, 8).as("shingle_fp"))
    val rep = TextAnalysis.repetitionPpm(corpus, "doc_id", "text", k = 3)

    val got = TextAnalysis.profile(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 7)

    expected.collect().foreach { e =>
      val r = got(e.getLong(0))
      for (c <- Seq("n_chars_calc", "n_tokens", "n_tokens_bpe", "n_punct",
          "quality_ppm", "lang_pred", "fp", "shingle_fp"))
        assert(r.getAs[Any](c) == e.getAs[Any](c), s"doc=${e.getLong(0)} col=$c")
    }
    // rep_ppm matches the standalone operator where text is non-null...
    rep.collect().foreach { e =>
      assert(got(e.getLong(0)).getAs[Any]("rep_ppm") == e.getAs[Any]("rep_ppm"),
        s"doc=${e.getLong(0)} rep_ppm")
    }
    // ...and null text yields null signals but lang_pred = "und"
    val nullRow = got(7L)
    assert(nullRow.isNullAt(nullRow.fieldIndex("rep_ppm")))
    assert(nullRow.isNullAt(nullRow.fieldIndex("n_chars_calc")))
    assert(nullRow.getAs[String]("lang_pred") == "und")
  }

  test("profile(signatures = true) appends the kernel signature columns") {
    val expected = corpus.select(
      col("doc_id"),
      SimHashText(col("text")).as("simhash"),
      MinHashSig(col("text"), 5, 64).as("minhash_sig"))
    val got = TextAnalysis.profile(corpus, "doc_id", "text", signatures = true)
      .select("doc_id", "simhash", "minhash_sig")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("fastFingerprint variant agrees on every shared signal and swaps only the fingerprint") {
    val slow = TextAnalysis.profile(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val fast = TextAnalysis.profile(corpus, "doc_id", "text",
        signatures = true, fastFingerprint = true)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(fast.size == slow.size)
    assert(!fast.values.head.schema.fieldNames.contains("shingle_fp"))
    slow.foreach { case (id, e) =>
      val r = fast(id)
      for (c <- Seq("n_chars_calc", "n_tokens", "n_tokens_bpe", "n_punct",
          "quality_ppm", "lang_pred", "rep_ppm", "fp"))
        assert(r.getAs[Any](c) == e.getAs[Any](c), s"doc=$id col=$c")
    }
    // the fast fingerprint IS minhash_sig's single-permutation minimum
    // over the same 8-char shingles — stable across both code paths
    val ref = corpus.select(col("doc_id"),
        element_at(MinHashSig(col("text"), 8, 1), 1).as("want"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
    fast.foreach { case (id, r) =>
      val got = if (r.isNullAt(r.fieldIndex("shingle_fp_fast"))) null
        else r.getAs[Long]("shingle_fp_fast")
      assert(got == ref(id), s"doc=$id shingle_fp_fast")
    }
  }
}
