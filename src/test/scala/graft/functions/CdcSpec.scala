package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking truth: determinism, length clamps, and the
  * property the whole family exists for — an edit moves only the chunk it
  * touches, because every later boundary re-synchronizes on content
  * (fixed-offset blocking loses every block after the edit). */
class CdcSpec extends SparkTestBase {

  private def chunks(s: String, bits: Int): Seq[Long] = {
    val a = CdcKernels.cdcChunks(UTF8String.fromString(s), bits)
    (0 until a.numElements()).map(a.getLong)
  }

  private val rnd = new scala.util.Random(7)
  private def randText(n: Int): String =
    Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString

  test("deterministic, covers the text, chunk lengths clamped to [avg/4, 4*avg]") {
    val doc = randText(4000)
    val a = chunks(doc, 5)
    assert(a == chunks(doc, 5))
    // reconstruct boundaries by re-running the rule: count and clamp are
    // implied by the digest count bounds for avg=32 over 4000 bytes
    assert(a.size >= 4000 / (4 * 32) && a.size <= 4000 / 8 + 1, s"n=${a.size}")
    assert(chunks("", 5).isEmpty)
    assert(chunks("x", 5).size == 1) // short doc = one tail chunk
  }

  test("an insertion changes O(1) chunks; fixed-offset blocking loses everything after it") {
    val doc = randText(8000)
    val base = chunks(doc, 5)
    // inject a banner near the front — the re-crawl scenario
    val edited = doc.substring(0, 100) + "<!-- served by cache-17 -->" + doc.substring(100)
    val after = chunks(edited, 5)
    val shared = base.toSet.intersect(after.toSet).size
    // all but a handful of chunks survive the edit (the touched chunk
    // and at most a couple of re-sync neighbours differ)
    assert(shared >= base.size - 4, s"shared=$shared of ${base.size}")
    // the fixed-offset strawman: 32-byte blocks after position 100 all shift
    val fixedBase = doc.getBytes("UTF-8").grouped(32).map(_.toSeq).toSet
    val fixedAfter = edited.getBytes("UTF-8").grouped(32).map(_.toSeq).toSet
    assert(fixedBase.intersect(fixedAfter).size < base.size / 2,
      "fixed blocking unexpectedly survived the shift")
  }

  test("cdcPairs: exact dups share everything, banner-edited near-dups found, unrelated absent") {
    import spark.implicits._
    val a = randText(2000)
    val b = randText(2000)
    val docs = Seq(
      (1L, a), (2L, a),                                              // exact dup
      (3L, a.substring(0, 50) + "INJECTED BANNER" + a.substring(50)), // near-dup of 1
      (4L, b))                                                        // unrelated
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.cdcPairs(docs, "doc_id", "text",
      avgBits = 5, minShared = 3L)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
