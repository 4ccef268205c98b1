package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Algorithmic truth for the true-BPE token counter: an INDEPENDENT
  * reference implementation (immutable, recursive — different shape from
  * the kernel's imperative arrays), hand-derived merge traces, and the
  * chain case proving the canonical lowest-rank loop differs from a single
  * in-rank-order pass. */
class BpeTokenCountSpec extends SparkTestBase {

  // ---- reference: classic BPE, written independently of the kernel
  private def mergeAll(l: List[String], a: String, b: String): List[String] = l match {
    case x :: y :: rest if x == a && y == b => (a + b) :: mergeAll(rest, a, b)
    case x :: rest => x :: mergeAll(rest, a, b)
    case Nil => Nil
  }
  private def refBpeSymbols(word: String): Int = {
    var syms = word.map(_.toString).toList
    var done = false
    while (!done && syms.length > 1) {
      val ranked = syms.zip(syms.tail)
        .filter(p => BpeFixture.rank(p._1, p._2) != Int.MaxValue)
      if (ranked.isEmpty) done = true
      else {
        val (a, b) = ranked.minBy(p => BpeFixture.rank(p._1, p._2))
        syms = mergeAll(syms, a, b)
      }
    }
    syms.length
  }
  private def refCount(text: String): Long =
    "[a-z]+|[0-9]+|[^a-z0-9 ]".r.findAllIn(text).map { tok =>
      if (tok.head >= 'a' && tok.head <= 'z')
        // mirror the kernel's heap-bound chunking of oversized runs
        tok.grouped(BpeTokenCount.MaxRunChars).map(refBpeSymbols(_).toLong).sum
      else 1L
    }.sum

  test("hand-derived merge traces") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // the|scan|stream|query collapse to 1 token each through multi-round
    // chains; digits stay one token per run; punct one per char
    assert(BpeTokenCount.count(u("the")) == 1)    // t+h (0), then th+e (20)
    assert(BpeTokenCount.count(u("scan")) == 1)   // a+n, s+c, sc+an
    // "stream": (r,e) then (s,t) fire; then (re,a)=24 preempts (st,re)=42,
    // stranding st|rea|m — greedy BPE is NOT optimal merging, and the
    // counter must reproduce the greedy answer, not the shortest one
    assert(BpeTokenCount.count(u("stream")) == 3)
    assert(BpeTokenCount.count(u("query")) == 1)
    // "query": (e,r) fires first, then (q,u) — rank 49 — CREATES the "qu"
    // that rank-30 (qu,er) consumes; a single in-rank-order pass would
    // leave qu|er|y = 3. The canonical loop must give 1.
    assert(BpeTokenCount.count(u("zzz")) == 3)          // nothing ranked
    assert(BpeTokenCount.count(u("boot 4217 x!")) == 7) // b,o,o,t / digit run / x / !
    assert(BpeTokenCount.count(u("fell")) == 3)         // f,e,ll — only (l,l) fires
    assert(BpeTokenCount.count(u("")) == 0)
    assert(BpeTokenCount.count(u("   ")) == 0)
  }

  test("kernel equals the independent reference on corpus-like and random text") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val words = Seq("the", "table", "value", "window", "group", "stream",
      "scan", "query", "and", "sort", "fast", "big", "merge", "batch",
      "column", "order", "data", "join", "filter", "hash", "key", "row")
    val rnd = new scala.util.Random(11)
    val samples = Seq(
      "the quick brown fox", "select * from t where x=1;",
      "a1b2c3 42 !!", "ALLCAPS stays punct-ish", "") ++
      (1 to 300).map(_ => (0 until rnd.nextInt(12))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")) ++
      (1 to 200).map { _ =>
        val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,!?"
        (0 until rnd.nextInt(40))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
    samples.foreach { s =>
      assert(BpeTokenCount.count(u(s)) == refCount(s), s"text=$s")
    }
  }

  test("oversized letter runs chunk deterministically (heap bound by construction)") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // 6000-char run: chunk 1 = 4096 chars, chunk 2 = 1904; merges never
    // span the boundary, and the count equals the chunked reference
    val run = "the" * 2000
    assert(BpeTokenCount.count(u(run)) == refCount(run))
    // uniform run (no ranked pairs): count is exactly the char count
    val flat = "z" * 10000
    assert(BpeTokenCount.count(u(flat)) == 10000L)
  }

  test("hand check: fell") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // f,e,l,l: (l,l) rank 9 -> f,e,ll ; (f,e)/(e,ll) unranked -> 3 symbols
    assert(BpeTokenCount.count(u("fell")) == refCount("fell"))
  }

  test("column expression matches the kernel through codegen") {
    import spark.implicits._
    val docs = Seq((1L, "the stream of data"), (2L, "x y z 123"), (3L, ""))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), BpeTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(
      1L -> refCount("the stream of data"),
      2L -> refCount("x y z 123"),
      3L -> 0L))
  }
}
