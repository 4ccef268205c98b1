package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed truth for the bigram-LM quality score: the corpus
  * conditional is exact integer math, so every expected value below is
  * derivable on paper. */
class LmScoreSpec extends SparkTestBase {

  test("hand-computed transition probabilities, floor mean and minimum") {
    import spark.implicits._
    // pairs: d1 -> (a b)(b c); d2 -> (a b)(b b); d3 -> (a c)
    // c2: "a b"=2, "b c"=1, "b b"=1, "a c"=1 ; c1: a=3, b=2
    // p_ppm: ab = 2e6 div 3 = 666666 ; bc = 1e6 div 2 = 500000
    //        bb = 500000 ; ac = 1e6 div 3 = 333333
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b b"),
      (3L, "a c"),
      (4L, "c"),                        // one token: no transitions
      (5L, null.asInstanceOf[String]),  // null text
      (6L, "!! 42 ??"))                 // no [a-z]+ tokens at all
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> ((2L, (666666L + 500000L) / 2, 500000L)),
      2L -> ((2L, (666666L + 500000L) / 2, 500000L)),
      3L -> ((1L, 333333L, 333333L))))
  }

  test("punctuation and digits never form transitions; a dominant pattern scores 1e6") {
    import spark.implicits._
    // "x y" is the ONLY transition in the corpus -> p = 1e6 everywhere
    val docs = Seq(
      (1L, "x y! x y? 42 x y"),
      (2L, "x, y.")).toDF("doc_id", "text")
    // d1 tokens: x,y,x,y,x,y -> pairs (x y)(y x)(x y)(y x)(x y)
    // d2 tokens: x,y -> (x y)
    // c2: "x y"=4, "y x"=2 ; c1: x=4, y=2 -> p(x y)=1e6, p(y x)=1e6
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      1L -> ((5L, 1000000L, 1000000L)),
      2L -> ((1L, 1000000L, 1000000L))))
  }

  test("an alien transition drags the minimum but not the mean as hard") {
    import spark.implicits._
    val common = (1 to 9).map(i => (i.toLong, "the table the table"))
    val rare = Seq((100L, "the zzz"))
    val docs = (common ++ rare).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // c1(the) = 19 pairs starting with "the": (the table)=18, (the zzz)=1
    assert(out(1L)._3 == (18L * 1000000L) / 19L)      // min = common pair
    assert(out(100L)._3 == 1000000L / 19L)            // min = the alien pair
    assert(out(100L)._3 < out(1L)._3)
  }

  test("lmScoreAgainst: reference model, unseen transitions score 0 and are counted") {
    import spark.implicits._
    // reference: pairs (a b)(b c)(a b) -> c2: ab=2, bc=1 ; c1: a=2, b=1
    // model: p(a b) = 1e6, p(b c) = 1e6
    val ref = Seq((10L, "a b c"), (11L, "a b")).toDF("doc_id", "text")
    // targets: d1 all seen; d2 mixes seen (a b) with unseen (b z);
    // d3 entirely unseen vocabulary
    val tgt = Seq(
      (1L, "a b c"),
      (2L, "a b z"),
      (3L, "q r"),
      (4L, "a"),                        // no transitions -> absent
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmScoreAgainst(ref, tgt, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      1L -> ((2L, 0L, 1000000L, 1000000L)),
      2L -> ((2L, 1L, 500000L, 0L)),   // (1e6 + 0) div 2; min is the unseen 0
      3L -> ((1L, 1L, 0L, 0L))))
    // the self-model grades doc 2's spam-free text the same as lmScore
    // would only when every pair is seen — the unseen rule is the delta
    assert(out(2L)._2 == 1L && out(1L)._2 == 0L)
  }
}
