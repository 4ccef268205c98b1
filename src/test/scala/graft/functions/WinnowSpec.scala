package graft.functions

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing truth: the deque kernel must equal an independent naive
  * per-window reference implementation exactly, honor the paper's
  * substring-match guarantee, and the pair operator must surface planted
  * local duplication. */
class WinnowSpec extends SparkTestBase {

  /** Independent O(n·w) reference: min hash value of every window. */
  private def reference(text: String, k: Int, w: Int): Seq[Long] = {
    val u = UTF8String.fromString(text)
    val n = math.max(u.numChars() - k + 1, 1)
    val h = (0 until n).map { i =>
      val s = u.substringSQL(i + 1, k)
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    }
    val windows = if (n <= w) Seq(h) else h.sliding(w).toSeq
    windows.map(_.min).distinct.sorted
  }

  private def kernel(text: String, k: Int, w: Int): Seq[Long] = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("t")
      .select(WinnowFps(col("t"), k, w).as("f"))
      .collect()(0).getSeq[Long](0)
  }

  test("kernel equals the naive per-window reference on varied inputs") {
    def noise(n: Int): String = noiseText(n, seed = 0x2545f4914f6cdd1dL + n)
    val samples = Seq(
      "short",                       // fewer shingles than the window
      "a" * 40,                      // all hashes equal
      "abcabcabcabcabcabcabcabc",    // periodic
      noise(500), noise(64), noise(17),
      "héllo wörld 日本語 " * 20)     // multi-byte chars
    for (t <- samples; (k, w) <- Seq((8, 16), (3, 4), (5, 1)))
      assert(kernel(t, k, w) == reference(t, k, w), s"k=$k w=$w text=${t.take(30)}…")
  }

  test("guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    var salt = 0L
    def noise(n: Int): String = { salt += 1; noiseText(n, seed = 0x9e3779b97f4a7c15L + salt) }
    val (k, w) = (8, 16)
    val shared = noise(w + k - 1) // exactly the guarantee length
    for (_ <- 0 until 20) {
      val a = noise(100) + shared + noise(80)
      val b = noise(120) + shared + noise(60)
      val common = kernel(a, k, w).toSet & kernel(b, k, w).toSet
      assert(common.nonEmpty, "guarantee violated: no shared fingerprint")
    }
  }

  test("winnowedPairs: planted containment found, disjoint docs not paired") {
    import spark.implicits._
    var salt = 0L
    def noise(n: Int): String = { salt += 1; noiseText(n, seed = 0x6a09e667f3bcc909L + salt) }
    val embedded = noise(120)
    val docs = Seq(
      (1L, embedded),                               // the small doc
      (2L, noise(200) + embedded + noise(150)),     // contains doc 1 verbatim
      (3L, noise(400)),                             // unrelated
      (4L, noise(350)))                             // unrelated
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(docs, "doc_id", "text",
        k = 8, w = 16, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"planted containment missed: $pairs")
    assert(pairs((1L, 2L)) >= 2L)
    assert(!pairs.contains((3L, 4L)), "unrelated docs paired")
  }
}
