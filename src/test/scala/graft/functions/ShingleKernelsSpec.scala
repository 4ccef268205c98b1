package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exactness proof for the shingle-set kernels against the
  * `array_distinct(transform(...))` formulations they replaced (kept here
  * as reference implementations): distinct-ness, FIRST-OCCURRENCE order,
  * char (code point) substr semantics on multi-byte text, sub-k texts,
  * the empty string, and the packed base-256 encoding including the
  * ascii('') = 0 tail positions.
  */
class ShingleKernelsSpec extends SparkTestBase {

  private def shinglesReference(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => text.substr(i, lit(k))))

  private def packedReference(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => (0 until k).map { j =>
        ascii(text.substr(i + lit(j), lit(1))).cast("long") * lit(1L << (8 * (k - 1 - j)))
      }.reduce(_ + _)))

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "héllo wörld — 日本語のテキスト mixed in"),
    (3L, "aa"),           // shorter than k
    (4L, ""),             // empty → one empty shingle
    (5L, "aaaaaaaaaaaa"), // heavy duplication
    (6L, "abcabcabcabc")) // repeated shingles, order matters

  test("ShingleSet is bit-identical to array_distinct(transform(substr))") {
    import spark.implicits._
    val docs = corpus.toDF("doc", "text")
    for (k <- Seq(3, 8)) {
      val mismatches = docs.select(
          ShingleSet(col("text"), k).as("kernel"),
          shinglesReference(col("text"), k).as("ref"))
        .filter(col("kernel") =!= col("ref")).count()
      assert(mismatches == 0, s"k=$k")
    }
  }

  test("PackedShingleSet is bit-identical to the ascii-shift formulation") {
    import spark.implicits._
    // ASCII only (the documented contract of the packed encoding)
    val docs = corpus.filter(_._1 != 2L).toDF("doc", "text")
    for (k <- Seq(3, 5, 7)) {
      val mismatches = docs.select(
          PackedShingleSet(col("text"), k).as("kernel"),
          packedReference(col("text"), k).as("ref"))
        .filter(col("kernel") =!= col("ref")).count()
      assert(mismatches == 0, s"k=$k")
    }
  }

  test("PackedShingleSet matches the formulation on non-ASCII code points too") {
    import spark.implicits._
    val docs = Seq((2L, "héllo wörld")).toDF("doc", "text")
    val mismatches = docs.select(
        PackedShingleSet(col("text"), 3).as("kernel"),
        packedReference(col("text"), 3).as("ref"))
      .filter(col("kernel") =!= col("ref")).count()
    assert(mismatches == 0)
  }
}
