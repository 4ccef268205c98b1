package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Kernel-level truth for [[BpeSpeculate]] — the exactness linchpin of
  * the trainer's speculate-verify rounds (BpeTrainerSpec pins the END
  * result against a reference trainer; this pins the kernel's delta
  * stream itself): aggregated rows must equal an independent brute-force
  * recount — step-0 bag = the pair/triple multiset AFTER pending merges,
  * each step-k row set = the exact multiset difference after speculated
  * merge k, weighted by the word frequency. */
class BpeSpeculateSpec extends SparkTestBase {
  import spark.implicits._

  private val Sep = "\u0001"

  private def mergeGreedy(s: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toList
  }

  private def bag(s: List[String], triples: Boolean): Map[String, Long] = {
    val m = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    s.sliding(2).foreach { case List(a, b) => m(a + Sep + b) += 1; case _ => () }
    if (triples)
      s.sliding(3).foreach { case List(a, b, c) => m(a + Sep + b + Sep + c) += 1; case _ => () }
    m.toMap
  }

  /** Expected aggregated (step, key) -> v over the whole corpus. */
  private def reference(words: Seq[(List[String], Long)],
      pending: Seq[(String, String)], spec: Seq[(String, String)],
      triples: Boolean): Map[(Int, String), Long] = {
    val acc = scala.collection.mutable.Map[(Int, String), Long]().withDefaultValue(0L)
    words.foreach { case (w0, n) =>
      var w = w0
      pending.foreach { case (a, b) => w = mergeGreedy(w, a, b) }
      bag(w, triples).foreach { case (k, c) => acc((0, k)) += c * n }
      spec.zipWithIndex.foreach { case ((a, b), i) =>
        val next = mergeGreedy(w, a, b)
        val before = bag(w, triples); val after = bag(next, triples)
        (before.keySet ++ after.keySet).foreach { k =>
          val d = after.getOrElse(k, 0L) - before.getOrElse(k, 0L)
          if (d != 0) acc((i + 1, k)) += d * n
        }
        w = next
      }
    }
    acc.filter(_._2 != 0).toMap
  }

  private def run(words: Seq[(List[String], Long)],
      pending: Seq[(String, String)], spec: Seq[(String, String)],
      triples: Boolean): Map[(Int, String), Long] =
    words.map { case (w, n) => (w, n) }.toDF("sym", "n")
      .select(explode(BpeSpeculate(col("sym"), col("n"), pending, spec, triples)).as("e"))
      .groupBy(col("e.step"), col("e.key")).agg(sum(col("e.v")).as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .filter(_._2 != 0).toMap

  test("seeded random corpora: delta stream equals brute-force recount") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def letter() = ('a' + rnd.nextInt(3)).toChar.toString
      val words = Seq.fill(40)(
        (List.fill(1 + rnd.nextInt(7))(letter()), 1L + rnd.nextInt(5)))
      def somePair() = (letter(), letter())
      val pending = Seq.fill(rnd.nextInt(3))(somePair())
      val spec = Seq.fill(2 + rnd.nextInt(5))(somePair())
      for (triples <- Seq(true, false))
        assert(run(words, pending, spec, triples) ==
          reference(words, pending, spec, triples),
          s"divergence at seed $seed triples=$triples pending=$pending spec=$spec")
    }
  }

  test("pending merges shape the base bag but emit no delta rows") {
    val words = Seq((List("a", "b", "c"), 2L))
    val got = run(words, Seq(("a", "b")), Nil, triples = false)
    // after pending (a,b): word is [ab, c] -> one pair, weighted 2
    assert(got == Map((0, "ab" + Sep + "c") -> 2L))
  }

  test("a speculated merge absent from a word emits nothing for that step") {
    val words = Seq((List("x", "y"), 1L))
    val got = run(words, Nil, Seq(("a", "b"), ("x", "y")), triples = false)
    assert(got((0, "x" + Sep + "y")) == 1L)
    assert(!got.keySet.exists(_._1 == 1), "step 1 (absent pair) must be silent")
    // step 2 merges (x,y) away: the word's only pair disappears
    assert(got((2, "x" + Sep + "y")) == -1L)
  }

  test("greedy overlap: (a,a) on a-runs matches the kernel contract") {
    val words = Seq((List("a", "a", "a"), 1L))
    val got = run(words, Nil, Seq(("a", "a")), triples = false)
    // before: (a,a) x2; after greedy: [aa, a] -> (aa, a) x1
    assert(got((1, "a" + Sep + "a")) == -2L)
    assert(got((1, "aa" + Sep + "a")) == 1L)
  }
}
