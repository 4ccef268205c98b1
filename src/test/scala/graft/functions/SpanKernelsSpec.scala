package graft.functions

import graft.{SparkTestBase, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class SpanKernelsSpec extends SparkTestBase {

  test("gram_digests: one hash per char position, char-based on multibyte text") {
    import spark.implicits._
    val out = Seq("αβγδε").toDF("t")
      .select(GramDigests(col("t"), 3).as("g"))
      .as[Seq[Long]].head()
    assert(out.length == 3) // 5 chars -> 3 grams of 3 chars
    // equal char-grams hash equal: positions 0 and 3 of "abcabc"
    val rep = Seq("abcabc").toDF("t")
      .select(GramDigests(col("t"), 3).as("g"))
      .as[Seq[Long]].head()
    assert(rep.length == 4 && rep(0) == rep(3) && rep(0) != rep(1))
  }

  test("gram_digests: shorter than k yields empty; null propagates") {
    import spark.implicits._
    val out = Seq("ab").toDF("t").select(GramDigests(col("t"), 3).as("g"))
      .as[Seq[Long]].head()
    assert(out.isEmpty)
    val n = Seq[Option[String]](None).toDF("t")
      .select(GramDigests(col("t"), 3).as("g")).head()
    assert(n.isNullAt(0))
  }

  test("duplicateSpans: fast (kernel) path output equals the exact md5 path on real data") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    def collectSpans(exact: Boolean): Map[Long, (Long, Long)] =
      TextAnalysis.duplicateSpans(docs, "doc_id", "text", L = 50, exact = exact)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val exact = collectSpans(exact = true)
    val fast = collectSpans(exact = false)
    assert(exact.nonEmpty, "testdata should contain duplicated 50-grams")
    assert(fast == exact)
  }

  test("gram_digests fuzz: digest equality == code-point gram equality (500 random strings)") {
    val rnd = new scala.util.Random(7)
    // ASCII + 2-byte + 3-byte + astral (4-byte, surrogate pair in UTF-16)
    val alphabet = "abδλ水火😀🚀".codePoints().toArray
    (1 to 500).foreach { _ =>
      val nCp = rnd.nextInt(30)
      val cps = Array.fill(nCp)(alphabet(rnd.nextInt(alphabet.length)))
      val s = new String(cps, 0, cps.length)
      val k = rnd.nextInt(5) + 1
      val digests = SpanKernels.gramDigests(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k).toLongArray()
      val n = math.max(nCp - k + 1, 0)
      assert(digests.length == n, s"count for nCp=$nCp k=$k")
      // expected grams sliced by CODE POINT (UTF8String semantics)
      val grams = (0 until n).map(i => new String(cps, i, k))
      for (i <- 0 until n; j <- i + 1 until n) {
        assert((digests(i) == digests(j)) == (grams(i) == grams(j)),
          s"digest/gram equality mismatch at ($i,$j) in '$s' k=$k")
      }
    }
  }

  test("duplicateSpans: adjacent and overlapping dup positions merge into one span") {
    import spark.implicits._
    // two docs sharing their full 12-char text -> every position dups,
    // one maximal span each covering the whole text
    val docs = Seq((1L, "aaaabbbbcccc"), (2L, "aaaabbbbcccc"), (3L, "unique-text-x")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpans(docs, "doc_id", "text", L = 4, exact = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 12L), (2L, 1L, 12L)))
  }

  test("duplicateSpans: struct and array id columns survive the UnsafeRow scan") {
    import spark.implicits._
    // duplicateSpans is a public generic operator; a buffer-backed VIEW id
    // (struct/array handed out by the reused UnsafeRow) must be COPIED by
    // the scanner's cp() or the deferred-by-one emission aliases the next
    // row's bytes into the staged id (r11 ADVICE). Eight docs sharing one
    // text interleave in the gram sort, so an aliasing bug scrambles ids.
    val base = Seq.tabulate(8)(i => (i.toLong, s"src_$i", "aaaabbbbcccc")) :+
      ((99L, "src_u", "unique-text-x"))
    val structDocs = base.toDF("k", "s", "text")
      .select(struct(col("k"), col("s")).as("id"), col("text"))
    val gotStruct = TextAnalysis.duplicateSpans(structDocs, "id", "text", L = 4, exact = true)
      .collect().map { r =>
        val id = r.getStruct(0)
        ((id.getLong(0), id.getString(1)), r.getLong(1), r.getLong(2))
      }.toSet
    assert(gotStruct ==
      (0 until 8).map(i => ((i.toLong, s"src_$i"), 1L, 12L)).toSet)

    val arrayDocs = base.toDF("k", "s", "text")
      .select(array(col("s"), concat(lit("x"), col("k"))).as("id"), col("text"))
    val gotArray = TextAnalysis.duplicateSpans(arrayDocs, "id", "text", L = 4, exact = true)
      .collect().map { r =>
        (r.getSeq[String](0).toList, r.getLong(1), r.getLong(2))
      }.toSet
    assert(gotArray ==
      (0 until 8).map(i => (List(s"src_$i", s"x$i"), 1L, 12L)).toSet)
  }
}
