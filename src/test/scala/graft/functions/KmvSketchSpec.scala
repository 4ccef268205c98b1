package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV distinct sketch: the spec pins the guarantees the rows-only
  * declared query (`q_kmv_overlap`) relies on — exact below capacity,
  * duplicate absorption, merge determinism across partitionings, bounded
  * relative error at capacity, null handling, codegen/interpreted parity
  * of the reader expressions.
  */
class KmvSketchSpec extends SparkTestBase {

  private def sketchOf(values: Seq[String], k: Int, parts: Int = 4): Seq[Long] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(KmvSketch(xxhash64(col("v")), k).as("s"))
      .head().getSeq[Long](0)
  }

  test("below capacity the sketch IS the distinct set: jaccard and distinct exact") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"item$i")
    val b = (6 to 15).map(i => s"item$i")
    val df = a.toDF("v").agg(KmvSketch(xxhash64(col("v")), 64).as("sa"))
      .crossJoin(b.toDF("v").agg(KmvSketch(xxhash64(col("v")), 64).as("sb")))
      .select(
        KmvJaccardPpm(col("sa"), col("sb"), 64).as("j"),
        KmvDistinctEstimate(col("sa"), 64).as("da"),
        KmvDistinctEstimate(col("sb"), 64).as("db"))
    val r = df.head()
    assert(r.getLong(0) == 5L * 1000000L / 15L) // |∩|=5, |∪|=15
    assert(r.getLong(1) == 10L && r.getLong(2) == 10L)
  }

  test("duplicates collapse: repeated input leaves the sketch unchanged") {
    val base = (1 to 50).map(i => s"d$i")
    assert(sketchOf(base, 32) == sketchOf(base ++ base ++ base, 32))
  }

  test("merge determinism: identical sketch under any partitioning") {
    val vs = (1 to 5000).map(i => s"v$i")
    val s1 = sketchOf(vs, 128, parts = 1)
    val s7 = sketchOf(vs, 128, parts = 7)
    val s32 = sketchOf(vs, 128, parts = 32)
    assert(s1 == s7 && s7 == s32 && s1.size == 128)
  }

  test("sketch is sorted unsigned-ascending and capped at k") {
    val s = sketchOf((1 to 1000).map(i => s"x$i"), 64)
    assert(s.size == 64)
    assert(s.sliding(2).forall {
      case Seq(a, b) => java.lang.Long.compareUnsigned(a, b) < 0
      case _ => true
    })
  }

  test("at capacity: distinct estimate and jaccard within bounded error") {
    import spark.implicits._
    // A = 1..5000, B = 2501..7500 → true |∪| = 7500, |∩| = 2500, J = 1/3
    val a = (1 to 5000).map(i => s"e$i")
    val b = (2501 to 7500).map(i => s"e$i")
    val k = 256
    val r = a.toDF("v").agg(KmvSketch(xxhash64(col("v")), k).as("sa"))
      .crossJoin(b.toDF("v").agg(KmvSketch(xxhash64(col("v")), k).as("sb")))
      .select(
        KmvJaccardPpm(col("sa"), col("sb"), k).as("j"),
        KmvDistinctEstimate(col("sa"), k).as("da"))
      .head()
    // CV ≈ 1/sqrt(k-2) ≈ 6.3%; assert a loose 20% band (deterministic
    // given xxhash64, so this cannot flake)
    assert(math.abs(r.getLong(0) - 333333L) < 70000L,
      s"jaccard estimate ${r.getLong(0)} off true 333333")
    assert(math.abs(r.getLong(1) - 5000L) < 1000L,
      s"distinct estimate ${r.getLong(1)} off true 5000")
  }

  test("nulls are ignored; empty input yields empty sketch, zero estimates") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("b"), None)
      .toDF("v")
      .agg(KmvSketch(when(col("v").isNotNull, xxhash64(col("v"))), 16).as("s"))
      .select(KmvDistinctEstimate(col("s"), 16).as("d"))
      .head().getLong(0)
    assert(withNulls == 2L)
    val empty = Seq.empty[String].toDF("v")
      .agg(KmvSketch(xxhash64(col("v")), 16).as("s"))
      .select(KmvDistinctEstimate(col("s"), 16).as("d"),
        KmvJaccardPpm(col("s"), col("s"), 16).as("j"))
      .head()
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("interpreted eval matches codegen for the reader expressions") {
    import spark.implicits._
    val df = (1 to 300).map(i => s"p$i").toDF("v")
      .agg(KmvSketch(xxhash64(col("v")), 32).as("s"))
    val row = df.select(
      KmvJaccardPpm(col("s"), col("s"), 32).as("j"),
      KmvDistinctEstimate(col("s"), 32).as("d")).head()
    // self-jaccard of a full sketch is exactly 1e6; estimate via the
    // interpreted path must agree
    val sk = df.head().getSeq[Long](0)
    val interp = KmvJaccardPpm(
      org.apache.spark.sql.catalyst.expressions.Literal.create(sk.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(sk.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      32).eval(null).asInstanceOf[Long]
    assert(row.getLong(0) == 1000000L && interp == 1000000L)
    val interpD = KmvDistinctEstimate(
      org.apache.spark.sql.catalyst.expressions.Literal.create(sk.toArray,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)),
      32).eval(null).asInstanceOf[Long]
    assert(row.getLong(1) == interpD)
  }
}
