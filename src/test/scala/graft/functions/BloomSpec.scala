package graft.functions

import graft.SparkTestBase
import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom prefilter invariants: zero false negatives by construction
  * (build and probe share one position formula), a sane false-positive
  * rate at the documented sizing, and — the one that matters — the
  * bloom-prefiltered decontamination path returning EXACTLY the exact
  * path's result. All deterministic: xxhash64 has no randomness, so
  * these assertions are stable, not statistical. */
class BloomSpec extends SparkTestBase {

  private val bits = 1 << 14
  private val hashes = 4

  private def build(members: Seq[String]): Array[Long] = {
    val words = BloomKernels.emptyWords(bits, hashes)
    members.foreach { m =>
      val ps = BloomKernels.positions(UTF8String.fromString(m), bits, hashes)
      (0 until ps.numElements()).foreach { i =>
        val p = ps.getInt(i)
        words(p >>> 6) |= 1L << (p & 63)
      }
    }
    words
  }

  test("no false negatives: every inserted member passes") {
    val members = (0 until 2000).map(i => s"gram-$i")
    val words = build(members)
    assert(members.forall(m =>
      BloomKernels.mightContain(UTF8String.fromString(m), words, bits, hashes)))
  }

  test("false-positive rate is near theory at the documented sizing") {
    // n=1000 into 2^14 bits, k=4: (1 - e^(-kn/m))^k ~ 0.25% — far under 5%
    val words = build((0 until 1000).map(i => s"member-$i"))
    val fp = (0 until 2000).count(i =>
      BloomKernels.mightContain(UTF8String.fromString(s"other-$i"), words, bits, hashes))
    assert(fp < 100, s"false-positive count $fp of 2000 — filter is not filtering")
  }

  test("expression path (codegen) agrees with the kernel on membership and nulls") {
    import spark.implicits._
    val words = build(Seq("alpha", "beta"))
    val out = Seq("alpha", "beta", "gamma-long-nonmember", null)
      .toDF("g")
      .select(col("g"), BloomMightContain(col("g"), words, hashes).as("hit"))
      .collect()
      .map(r => Option(r.getString(0)) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
      .toMap
    assert(out(Some("alpha")) == Some(true))
    assert(out(Some("beta")) == Some(true))
    assert(out(None).isEmpty) // null gram -> null, not a spurious hit
    // gamma may false-positive in principle; only assert it evaluated
    assert(out.contains(Some("gamma-long-nonmember")))
  }

  test("contaminationBloom equals contamination exactly (planted overlaps)") {
    import spark.implicits._
    // eval docs share 8-gram windows with some train docs, not others
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val train = (0L until 40L).map { i =>
      val t = i % 4 match {
        case 0 => s"doc $i mentions the quick brown fox once"
        case 1 => s"doc $i says pack my box with care"
        case 2 => s"doc $i is entirely original content number $i"
        case _ => null
      }
      (i, t)
    }.toDF("doc_id", "text")
    val exact = Corpus.contamination(train, eval, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloomed = Corpus.contaminationBloom(train, eval, "doc_id", "text", k = 8,
      bits = 1 << 12, hashes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted overlaps produced no contamination rows")
    assert(bloomed == exact)
  }

  test("shape validation rejects non-power-of-two bit widths") {
    intercept[IllegalArgumentException](BloomKernels.emptyWords(1000, 4))
    intercept[IllegalArgumentException](BloomKernels.emptyWords(1 << 14, 0))
  }
}
