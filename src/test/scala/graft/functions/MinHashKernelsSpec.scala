package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-exactness proof for the MinHash kernels against the explode →
  * min-aggregate / zip_with formulations they replaced (kept here as
  * reference implementations), over texts that exercise the tricky
  * corners: multi-byte UTF-8 (substr is CHAR-based), texts shorter than
  * k, the empty string, and repeated shingles.
  */
class MinHashKernelsSpec extends SparkTestBase {

  /** The original explode → perms-way min-agg signature (pre-kernel). */
  private def sigReference(docs: DataFrame, k: Int, perms: Int): DataFrame = {
    val rawShingles = transform(
      sequence(lit(1), greatest(length(col("text")) - lit(k - 1), lit(1))),
      i => col("text").substr(i, lit(k)))
    val exploded = docs
      .select(col("doc"), explode(rawShingles).as("s"))
      .select(col("doc"), xxhash64(col("s")).as("h"))
    val minAggs = (0 until perms).map(p => min(xxhash64(lit(p), col("h"))).as(s"m$p"))
    exploded.groupBy("doc")
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc"), array((0 until perms).map(p => col(s"m$p")): _*).as("sig"))
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "héllo wörld — 日本語のテキスト mixed with ascii"),
    (3L, "aa"),            // shorter than k → single clamped shingle
    (4L, ""),              // empty → single empty shingle
    (5L, "aaaaaaaaaaaa"),  // all shingles identical (multiset = set)
    (6L, "xyz"))

  test("MinHashSig is bit-identical to the explode+min-agg formulation") {
    import spark.implicits._
    val docs = corpus.toDF("doc", "text")
    for ((k, perms) <- Seq((3, 8), (5, 64))) {
      val kernel = docs.select(col("doc"), MinHashSig(col("text"), k, perms).as("sig"))
      val ref = sigReference(docs, k, perms)
      val joined = kernel.as("a").join(ref.as("b"), "doc")
        .filter(col("a.sig") =!= col("b.sig"))
      assert(joined.count() == 0, s"k=$k perms=$perms")
    }
  }

  test("PositionalEqCount matches the zip_with formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (1 to 100).map { i =>
      val n = rnd.nextInt(64) + 1
      val a = Seq.fill(n)(rnd.nextLong() % 4) // small range → frequent ties
      val b = Seq.fill(n)(rnd.nextLong() % 4)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val mismatches = df.select(
        PositionalEqCount(col("a"), col("b")).as("kernel"),
        size(filter(zip_with(col("a"), col("b"), (x, y) => x === y), v => v))
          .cast("long").as("ref"))
      .filter(col("kernel") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("PositionalEqCount treats null slots as non-equal (SQL callers)") {
    import spark.implicits._
    // arrays with null elements can reach the kernel via the registered
    // SQL function; a null slot must never count as an agreement
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (2L, Seq[java.lang.Long](null, 2L), Seq[java.lang.Long](0L, 2L)),
      (3L, Seq[java.lang.Long](7L), Seq[java.lang.Long](null))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), PositionalEqCount(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }
}
