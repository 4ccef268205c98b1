package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result-exactness proofs for the per-document text kernels against the
  * aggregation/higher-order formulations they replaced.
  */
class TextKernelsSpec extends SparkTestBase {

  /** The former explode + two-aggregate repetition formulation. */
  private def repetitionReference(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc"),
        explode(transform(
          sequence(lit(1), greatest(length(col("text")) - lit(k - 1), lit(1))),
          i => col("text").substr(i, lit(k)))).as("__g"))
      .groupBy(col("doc"), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc"))
      .agg(max("__c").as("__max_c"), sum("__c").as("__n"))
      .select(col("doc"), expr("(__max_c * 1000000) div __n").as("rep_ppm"))

  /** The former per-token transform+xxhash64 simhash formulation. */
  private def simhashReference(text: Column): Column = {
    val hashes = transform(split(text, " "), t => xxhash64(t))
    (0 until 64).map { j =>
      val mask = lit(1L << j)
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= lit(0L), lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, mask).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "héllo wörld — 日本語のテキスト mixed in"),
    (3L, "aa"), (4L, ""), (5L, "aaaaaaaaaaaa"), (6L, "abcabcabcabc"),
    (7L, "double  spaces  here"), (8L, " leading and trailing "),
    (9L, "   "), (10L, "one"))

  test("RepetitionPpm kernel equals the explode+aggregate formulation") {
    import spark.implicits._
    val docs = corpus.toDF("doc", "text")
    for (k <- Seq(3, 8)) {
      val kernel = docs.select(col("doc"),
        RepetitionPpm(col("text"), k).as("rep_ppm"))
      val joined = kernel.as("a").join(repetitionReference(docs, k).as("b"), "doc")
        .filter(col("a.rep_ppm") =!= col("b.rep_ppm"))
      assert(joined.count() == 0, s"k=$k")
    }
  }

  test("operator: kernel and distributed variants agree; null texts dropped by both " +
    "(the pre-kernel shape emitted a spurious 1e6 for null text)") {
    import spark.implicits._
    val docs = (corpus.map { case (d, t) => (d, Option(t)) } :+ (99L, None))
      .toDF("doc", "text")
    val fast = graft.operators.TextAnalysis.repetitionPpm(docs, "doc", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = graft.operators.TextAnalysis.repetitionPpmDistributed(docs, "doc", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
    assert(!fast.contains(99L)) // null text keeps the old dropped-row contract
  }

  test("oversized rows fall back to the offset-sort path with identical results " +
    "(heap bound holds by construction)") {
    import spark.implicits._
    val docs = (corpus.toSeq :+
      (50L, "spam spam spam " * 40) :+            // degenerate repetition
      (51L, (1 to 500).mkString(" ")) :+          // mostly-distinct grams
      (52L, "日本語テキスト" * 100))                // multi-byte, repeated
      .toDF("doc", "text")
    for (k <- Seq(3, 8)) {
      // maxMapChars = 0 forces EVERY row onto the sorted fallback
      val sorted = docs.select(col("doc"), RepetitionPpm(col("text"), k, 0).as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val mapped = docs.select(col("doc"), RepetitionPpm(col("text"), k).as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sorted == mapped, s"k=$k")
    }
    // direct kernel check on the edges the DataFrame above can't carry
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(TextKernels.repetitionPpmSorted(u(""), 3)
      == TextKernels.repetitionPpm(u(""), 3, Int.MaxValue))
    assert(TextKernels.repetitionPpmSorted(u("ab"), 3)
      == TextKernels.repetitionPpm(u("ab"), 3, Int.MaxValue))
  }

  test("offset-sort path equals the map path on random unicode strings") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val rnd = new scala.util.Random(42)
    val alphabet = "ab日х €\n"
    for (trial <- 1 to 200) {
      val s = (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = 1 + rnd.nextInt(6)
      assert(TextKernels.repetitionPpmSorted(u(s), k)
        == TextKernels.repetitionPpm(u(s), k, Int.MaxValue),
        s"trial=$trial k=$k s=${s.take(40)}")
    }
  }

  test("ASCII packed-gram path equals the offset-sort path, k in 1..8") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdef gh.\n"
    for (trial <- 1 to 300) {
      val s = (0 until rnd.nextInt(200))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = 1 + rnd.nextInt(8) // every k on the packed path
      assert(TextKernels.repetitionPpmSorted(u(s), k)
        == TextKernels.repetitionPpm(u(s), k, Int.MaxValue),
        s"trial=$trial k=$k s=${s.take(40)}")
    }
  }

  test("MinShingleMd5 kernel equals array_min(transform(md5)) bit-for-bit") {
    import spark.implicits._
    def reference(text: Column, k: Int): Column =
      array_min(transform(
        sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
        i => md5(text.substr(i, lit(k)).cast("binary"))))
    val docs = corpus.toDF("doc", "text")
    for (k <- Seq(3, 8)) {
      val mismatches = docs.select(
          MinShingleMd5(col("text"), k).as("kernel"),
          reference(col("text"), k).as("ref"))
        .filter(col("kernel") =!= col("ref")).count()
      assert(mismatches == 0, s"k=$k")
    }
  }

  test("SimHashText kernel is bit-identical to transform(split)+vote") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val words = Seq("alpha", "beta", "γάμμα", "", "x", "longword" * 3)
    val random = (11L to 60L).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val docs = (corpus ++ random).toDF("doc", "text")
    val mismatches = docs.select(
        SimHashText(col("text")).as("kernel"),
        simhashReference(col("text")).as("ref"))
      .filter(col("kernel") =!= col("ref")).count()
    assert(mismatches == 0)
  }
}
