package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Algorithmic truth for the BPE ENCODER (the token-emitting twin of
  * `BpeTokenCount`): an independent reference encoder (immutable,
  * recursive), equality with the counter, the concat round-trip
  * invariant, and learn→encode parity with a table trained by
  * `BpeTrainer` — the full tokenizer-workflow contract. */
class BpeEncodeSpec extends SparkTestBase {

  // ---- reference: classic BPE emitting tokens, independent of the kernel
  private def mergeAll(l: List[String], a: String, b: String): List[String] = l match {
    case x :: y :: rest if x == a && y == b => (a + b) :: mergeAll(rest, a, b)
    case x :: rest => x :: mergeAll(rest, a, b)
    case Nil => Nil
  }
  private def refMergeWord(word: String, merges: Vector[(String, String)]): List[String] = {
    def rank(a: String, b: String): Int = {
      val i = merges.indexOf((a, b)) // first occurrence wins, like putIfAbsent
      if (i < 0) Int.MaxValue else i
    }
    var syms = word.map(_.toString).toList
    var done = false
    while (!done && syms.length > 1) {
      val ranked = syms.zip(syms.tail).filter(p => rank(p._1, p._2) != Int.MaxValue)
      if (ranked.isEmpty) done = true
      else {
        val (a, b) = ranked.minBy(p => rank(p._1, p._2))
        syms = mergeAll(syms, a, b)
      }
    }
    syms
  }
  private def refEncode(text: String, merges: Vector[(String, String)]): List[String] =
    "[a-z]+|[0-9]+|[^a-z0-9 ]".r.findAllIn(text).toList.flatMap { tok =>
      if (tok.head >= 'a' && tok.head <= 'z')
        tok.grouped(BpeTokenCount.MaxRunChars).toList.flatMap(refMergeWord(_, merges))
      else List(tok)
    }

  private def kernelEncode(s: String, table: BpeMergeTable): List[String] = {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val arr = BpeEncode.encode(u(s), table)
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString).toList
  }

  private val samples: Seq[String] = {
    val words = Seq("the", "table", "value", "window", "group", "stream",
      "scan", "query", "and", "sort", "fast", "big", "merge", "batch",
      "column", "order", "data", "join", "filter", "hash", "key", "row")
    val rnd = new scala.util.Random(23)
    Seq("the quick brown fox", "select * from t where x=1;",
      "a1b2c3 42 !!", "ALLCAPS stays punct-ish", "", "   ", "query stream") ++
      (1 to 300).map(_ => (0 until rnd.nextInt(12))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")) ++
      (1 to 200).map { _ =>
        val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,!?"
        (0 until rnd.nextInt(40))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
  }

  test("fixture encode equals the independent reference encoder") {
    samples.foreach { s =>
      assert(kernelEncode(s, BpeMergeTable.fixture) == refEncode(s, BpeFixture.merges),
        s"text=$s")
    }
    // the chain case: (q,u) — the LAST rank — creates the "qu" that
    // rank-30 (qu,er) consumes; the canonical loop must emit ONE token
    assert(kernelEncode("query", BpeMergeTable.fixture) == List("query"))
    // greedy stranding: (re,a) preempts (st,re) → st|rea|m, not shortest
    assert(kernelEncode("stream", BpeMergeTable.fixture) == List("st", "rea", "m"))
  }

  test("size(encode) equals BpeTokenCount under the same table") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    samples.foreach { s =>
      assert(kernelEncode(s, BpeMergeTable.fixture).size.toLong ==
        BpeTokenCount.count(u(s)), s"text=$s")
    }
  }

  test("concat round-trip: tokens rejoin to the input minus spaces") {
    samples.foreach { s =>
      assert(kernelEncode(s, BpeMergeTable.fixture).mkString == s.replace(" ", ""),
        s"text=$s")
    }
    // oversized run: chunk boundary never drops or duplicates chars
    val run = "the" * 2000
    assert(kernelEncode(run, BpeMergeTable.fixture).mkString == run)
  }

  test("learn -> encode parity: a BpeTrainer table drives the kernel like the reference") {
    import spark.implicits._
    val corpus = Seq(
      "the table the table value", "stream table the value",
      "the window group value table", "query the stream 11 11",
      "group window the table").toDF("text")
    val mergesDf = graft.operators.BpeTrainer.learnMerges(corpus, "text", numMerges = 8)
    val learned = mergesDf.select("rank", "left", "right").collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toVector
    assert(learned.nonEmpty)
    val table = graft.operators.BpeTrainer.tableOf(mergesDf)
    val texts = Seq("the table value", "stream query window",
      "tables are not the table", "11 11 group", "")
    texts.foreach { t =>
      assert(kernelEncode(t, table) == refEncode(t, learned), s"text=$t")
      import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
      assert(BpeTokenCount.count(u(t), table) == refEncode(t, learned).size.toLong)
    }
  }

  test("column expressions match through codegen; null text propagates null") {
    import spark.implicits._
    val docs = Seq((1L, "the stream of data"), (2L, "x y z 123"), (3L, ""),
      (4L, null)).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        BpeEncode(col("text")).as("toks"),
        BpeTokenCount(col("text"), BpeMergeTable.fixture).as("n"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[String](1).toList,
        if (r.isNullAt(2)) -1L else r.getLong(2))).toList
    assert(out.toSet == Set(
      (1L, refEncode("the stream of data", BpeFixture.merges), refEncode("the stream of data", BpeFixture.merges).size.toLong),
      (2L, refEncode("x y z 123", BpeFixture.merges), 4L),
      (3L, Nil, 0L),
      (4L, null, -1L)))
  }
}
