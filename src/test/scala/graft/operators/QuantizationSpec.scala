package graft.operators

import graft.SparkTestBase
import graft.functions.{IntDotProduct, QuantizeInt8}
import org.apache.spark.sql.functions._

/** Int8 quantization: exact kernel semantics (the oracle mirrors
  * `floor(x·127/maxabs + 0.5)` verbatim, so the truth table IS the
  * contract), bounded cosine error vs full precision, and top-k agreement
  * on separated clusters. */
class QuantizationSpec extends SparkTestBase {

  test("quantizeInt8 truth table: scaling, rounding, zero vector, empty") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array.empty[Float]),
      (4L, Array(-2.0f, 1.0f))) // negative max-abs element
    val out = rows.toDF("id", "v")
      .select(col("id"), QuantizeInt8(col("v")).as("q"))
      .as[(Long, Array[Int])].collect().toMap
    assert(out(1L).toSeq == Seq(127, -63, 32, 0)) // floor(-63.5+0.5) = -63
    assert(out(2L).toSeq == Seq(0, 0))
    assert(out(3L).toSeq == Seq())
    assert(out(4L).toSeq == Seq(-127, 64)) // floor(1·127/2 + 0.5) = 64
    // range law on arbitrary vectors: every element in [-127, 127]
    val rnd = new scala.util.Random(7)
    val big = (0L until 50L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    big.toDF("id", "v").select(QuantizeInt8(col("v")).as("q"))
      .as[Array[Int]].collect()
      .foreach(q => assert(q.forall(x => x >= -127 && x <= 127)))
  }

  test("intDotProduct exact, length-min semantics") {
    import spark.implicits._
    val out = Seq((Array(2, -3, 100000), Array(4, 5, 100000)))
      .toDF("a", "b")
      .select(IntDotProduct(col("a"), col("b")).as("d"),
        IntDotProduct(col("a"), col("a")).as("n"))
      .as[(Long, Long)].head()
    assert(out._1 == 8L - 15L + 10000000000L) // products beyond Int range
    assert(out._2 == 4L + 9L + 10000000000L)
  }

  test("quantized cosine tracks exact cosine within int8 error bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 39)
      .select("qid", "cand_id", "sim").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val quant = Similarity.quantizedTopK(emb, q, "vec_id", "embedding", 39)
      .select("qid", "cand_id", "sim").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(quant.keySet == exact.keySet)
    // per-element error <= 0.5/127 of max-abs; over 64 dims the cosine
    // drift stays well inside 0.03 (generous — observed ~0.005)
    quant.foreach { case (k, s) => assert(math.abs(s - exact(k)) < 0.03, s"$k") }
  }

  test("semantic-dedup clusters: CC over LSH near-dup pairs recovers the planted clusters") {
    import spark.implicits._
    def v(base: Array[Float], eps: Float, d: Int) = {
      val a = base.clone(); a(d) = a(d) + eps; a
    }
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(8)(i => if (i == 1) 1.0f else 0.0f)
    val rows =
      (0 until 5).map(i => (i.toLong, v(e1, 0.01f * i, 3))) ++
        (10 until 15).map(i => (i.toLong, v(e2, 0.01f * i, 4))) ++
        Seq((20L, Array.tabulate(8)(i => if (i == 2) 1.0f else 0.0f))) // singleton
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", minCosine = 0.9)
      .select(col("qid").as("src"), col("cand_id").as("dst"))
    val comp = Dedup.connectedComponents(pairs, "src", "dst")
    val labels = emb.select(col("vec_id"))
      .join(comp.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("comp"), col("vec_id")).as("component"))
      .as[(Long, Long)].collect().toMap
    // each planted cluster collapses to its min id; the singleton stays itself
    (0L until 5L).foreach(i => assert(labels(i) == 0L, s"vec $i"))
    (10L until 15L).foreach(i => assert(labels(i) == 10L, s"vec $i"))
    assert(labels(20L) == 20L)
  }

  test("quantized top-k equals full-precision top-k on separated clusters") {
    import spark.implicits._
    def v(base: Array[Float], eps: Float, d: Int) = {
      val a = base.clone(); a(d) = a(d) + eps; a
    }
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(8)(i => if (i == 1) 1.0f else 0.0f)
    val rows =
      (0 until 5).map(i => (i.toLong, v(e1, 0.01f * i, 3))) ++
        (10 until 15).map(i => (i.toLong, v(e2, 0.01f * i, 4)))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0 || col("vec_id") === 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("qid", "cand_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 3)
      .select("qid", "cand_id").as[(Long, Long)].collect().toSet
    assert(quant == brute) // clusters far apart: int8 noise cannot flip them
  }
}
