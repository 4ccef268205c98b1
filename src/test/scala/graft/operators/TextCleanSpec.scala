package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Truth tables for the corpus cleaning operators: normalization on
  * degenerate byte sequences and line-df boilerplate removal semantics. */
class TextCleanSpec extends SparkTestBase {

  private def norm(s: String): String = {
    import spark.implicits._
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.normalize(col("t")).as("n"))
      .collect()(0).getString(0)
  }

  test("normalize: newline canonicalization, tabs, control chars, space runs") {
    assert(norm("a\r\nb\rc") == "a\nb\nc")          // CRLF + lone CR → LF
    assert(norm("a\tb\t\tc") == "a b c")            // tabs → spaces, collapsed
    assert(norm("a\u0000b\u0001c\u007fd") == "abcd") // C0 + DEL stripped
    assert(norm("a   b  c") == "a b c")             // space runs collapse
    assert(norm("  a \n  b  \n c  ") == "a\nb\nc")  // line-edge + end trims
    assert(norm("") == "")
    assert(norm("héllo wörld 日本語") == "héllo wörld 日本語") // unicode untouched
    assert(norm("\u0002\u0003") == "")              // control-only → empty
  }

  test("clean: drops lines over the df threshold, keeps order, keeps all docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "HEADER\nunique one\nFOOTER"),
      (2L, "HEADER\nunique two\nFOOTER"),
      (3L, "HEADER\nunique three\nHEADER\nFOOTER"), // dup line in one doc: df counts once
      (4L, "HEADER\nFOOTER"),                        // all boilerplate → empty
      (5L, "alpha\nbeta"),                           // nothing boilerplate
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // HEADER df=4, FOOTER df=4 > 2; every other line df=1
    val out = TextAnalysis.clean(docs, "doc_id", "text", maxLineDf = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out(1L) == (("unique one", 1L, 2L)))
    assert(out(2L) == (("unique two", 1L, 2L)))
    assert(out(3L) == (("unique three", 1L, 3L))) // both HEADER copies dropped
    assert(out(4L) == (("", 0L, 2L)))             // all-boilerplate doc kept as row
    assert(out(5L) == (("alpha\nbeta", 2L, 0L)))
    // null text stays NULL with 0 kept / 0 dropped — a decode failure must
    // not read as "legitimately cleaned to empty", and kept+dropped
    // accounting must reconcile (the old shape emitted '' with NULL
    // dropped, silently skipped by any SUM)
    assert(out(6L) == ((null, 0L, 0L)))
  }

  test("redactPii: typed placeholders, rule order, count semantics") {
    import spark.implicits._
    def redact(s: String): (String, Long, Long, Long) = {
      val counts = TextAnalysis.piiCounts(col("t")).map { case (n, c) => c.as(n) }
      val r = Seq(Tuple1(s)).toDF("t")
        .select(Seq(TextAnalysis.redactPii(col("t")).as("r")) ++ counts: _*)
        .collect()(0)
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    assert(redact("mail bob.smith+x@sub.example.co.uk now")
      == (("mail <EMAIL> now", 1L, 0L, 0L)))
    assert(redact("call +44 (0)20 7946-0958 today")
      == (("call <PHONE> today", 0L, 0L, 1L)))
    // a dotted quad is phone-shaped too — the IPv4 rule must win
    assert(redact("host 192.168.10.250 up")
      == (("host <IP> up", 0L, 1L, 0L)))
    assert(redact("a@b.io 1.2.3.4 5551234567")
      == (("<EMAIL> <IP> <PHONE>", 1L, 1L, 1L)))
    // short digit runs are not phones; bare words untouched
    assert(redact("room 404 on floor 12") == (("room 404 on floor 12", 0L, 0L, 0L)))
    assert(redact("no pii here") == (("no pii here", 0L, 0L, 0L)))
  }

  test("extractHtml: tags, script/style content, entity single-decode, whitespace") {
    import spark.implicits._
    def ex(s: String): String =
      Seq(Tuple1(s)).toDF("h")
        .select(TextAnalysis.extractHtml(col("h")).as("t"))
        .collect()(0).getString(0)
    assert(ex("<p>a</p>") == "a")
    assert(ex("<script>if (x<y) go();</script>hi") == "hi")  // content dropped too
    assert(ex("<SCRIPT src='x'>a</SCRIPT>ok") == "ok")       // case-insensitive
    assert(ex("<style>b { c: d; }</style>ok") == "ok")
    assert(ex("Tom &amp; Jerry") == "Tom & Jerry")
    assert(ex("&amp;lt;") == "&lt;")                          // SINGLE decode
    assert(ex("&lt;tag&gt;") == "<tag>")  // encoded markup is content, kept
    assert(ex("&quot;q&quot; &#39;a&#39;&nbsp;b") == "\"q\" 'a' b")
    assert(ex("<div>a</div>\n\n <div>b</div>") == "a b")
    assert(ex("<a href=\"x\">link</a> tail") == "link tail")
  }

  test("dedupLines: keeps first occurrence, preserves order, counts drops") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav\nbody\nnav\nfooter\nbody\nfooter"), // interleaved repeats
      (2L, "only line"),                            // nothing to drop
      (3L, "x\nx\nx\nx"),                           // one survivor
      (4L, ""),                                     // empty doc = one empty line
      (5L, "a\n\nb\n\na"),                          // blank lines dedup too
      (6L, null.asInstanceOf[String]))              // null text excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("nav\nbody\nfooter", 3L, 3L)))
    assert(out(2L) == (("only line", 1L, 0L)))
    assert(out(3L) == (("x", 1L, 3L)))
    assert(out(4L) == (("", 1L, 0L)))
    assert(out(5L) == (("a\n\nb", 3L, 2L)))
    assert(!out.contains(6L)) // declared null policy: null docs excluded
  }

  test("dedupLinesCorpus: global keep-first, in-doc repeats drop, all docs survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav\nalpha\nnav"),   // first doc: keeps nav once (in-doc repeat drops)
      (2L, "nav\nbeta"),         // nav already seen in doc 1 → dropped here
      (3L, "alpha\nnav"),        // everything already claimed → empty survivor
      (4L, "gamma"),             // unique line untouched
      (5L, null.asInstanceOf[String])) // null text excluded up front
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesCorpus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("nav\nalpha", 2L, 1L)))
    assert(out(2L) == (("beta", 1L, 1L)))
    assert(out(3L) == (("", 0L, 2L))) // all-duplicate doc survives as empty
    assert(out(4L) == (("gamma", 1L, 0L)))
    assert(!out.contains(5L))
  }

  test("dedupLinesCorpus: keeper is the min (doc, pos) instance, not an arbitrary one") {
    import spark.implicits._
    // same line at doc 2 pos 0 and doc 1 pos 2 — doc order wins over pos
    val docs = Seq((2L, "late\nx"), (1L, "a\nb\nlate")).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesCorpus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a\nb\nlate")
    assert(out(2L) == "x")
  }

  test("dedupLinesCorpus: paragraph separator dedups C4-style units, newlines intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro text\nwith two lines\n\nshared disclaimer"),
      (2L, "shared disclaimer\n\nown body")) // disclaimer already claimed by doc 1
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesCorpus(docs, "doc_id", "text", sep = "\n\n")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("intro text\nwith two lines\n\nshared disclaimer", 2L)))
    assert(out(2L) == (("own body", 1L))) // intra-paragraph newlines untouched
  }

  test("boilerplateReport: df threshold inclusive, counts distinct docs vs occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav\nbody1\nnav"), // nav twice in one doc: df 1, occurrences 2
      (2L, "nav\nbody2"),
      (3L, "nav\nfoot"),
      (4L, "foot\nbody4"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rep = TextAnalysis.boilerplateReport(docs, "doc_id", "text", minDf = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rep.keySet == Set("nav", "foot")) // body* are df=1 → excluded
    assert(rep("nav") == ((3L, 4L, 750000L)))  // 3 of 4 non-null docs
    assert(rep("foot") == ((2L, 2L, 500000L)))
  }

  test("encodingReport: mojibake/control/non-ascii doc counts, ascii char share") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "clean ascii"),                 // 11 chars, all ascii
      ("s1", "bad \uFFFD here"),             // 10 chars, 1 non-ascii (mojibake)
      ("s1", "bell\u0007"),                  // 5 chars, ctrl but ASCII mass
      ("s2", "café"),                   // 4 chars, 1 non-ascii
      ("s2", null.asInstanceOf[String]))
      .toDF("source", "text")
    val out = TextAnalysis.encodingReport(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // s1: 26 chars total, 25 ascii -> floor(25e6/26) = 961538
    assert(out("s1") == ((3L, 1L, 1L, 1L, 961538L)))
    // s2: 4 chars, 3 ascii -> 750000; null doc excluded
    assert(out("s2") == ((1L, 0L, 0L, 1L, 750000L)))
  }

  test("termDrift: exact counts/ppm deltas, one-sided tokens, empty-side guard") {
    import spark.implicits._
    val oldSnap = Seq((1L, "a a b c"), (2L, "a b"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val newSnap = Seq((4L, "a b b d")).toDF("doc_id", "text")
    val out = TextAnalysis.termDrift(oldSnap, newSnap, "text", minCount = 1L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // old mass 6 (a a b c a b), new mass 4 (a b b d)
    assert(out("a") == ((3L, 1L, 500000L, 250000L, -250000L)))
    assert(out("b") == ((2L, 2L, 333333L, 500000L, 166667L)))
    assert(out("c") == ((1L, 0L, 166666L, 0L, -166666L)))   // vanished token
    assert(out("d") == ((0L, 1L, 0L, 250000L, 250000L)))    // new token
    // empty old side: ppm must be zeros, not a divide-by-null crash
    val fromEmpty = TextAnalysis.termDrift(
      oldSnap.filter(col("doc_id") < 0), newSnap, "text", minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fromEmpty.keySet == Set("a", "b", "d") && fromEmpty.values.forall(_ == 0L))
  }

  test("clean: df threshold is strict (df == maxLineDf survives)") {
    import spark.implicits._
    val docs = Seq((1L, "shared\na"), (2L, "shared\nb")).toDF("doc_id", "text")
    val out = TextAnalysis.clean(docs, "doc_id", "text", maxLineDf = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "shared\na", 2L -> "shared\nb"))
  }
}
