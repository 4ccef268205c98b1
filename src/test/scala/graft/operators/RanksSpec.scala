package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranks]] must be bit-identical to the naive single-partition window
  * for every statistic it decomposes — row_number, inclusive running sum,
  * and NTILE — including heavy ties, skewed keys, and bucket counts that
  * exceed / equal / divide the row count. The eight q_* oracle rows pin
  * the same thing end to end against DuckDB; this spec pins the algebra
  * directly against Spark's own window functions so a future edit can't
  * pass the oracles by accident on one data shape. */
class RanksSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic skewed fixture: many ties in v (xorshift mod 37), ids total-order
  private def fixture(n: Int) = {
    var x = 0x9e3779b97f4a7c15L
    (0 until n).map { i =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (i.toLong, java.lang.Long.remainderUnsigned(x, 37L),
        1L + java.lang.Long.remainderUnsigned(x >>> 7, 1000L))
    }.toDF("id", "v", "size")
  }

  test("decomposed row_number == Window.orderBy row_number (ties, several bucket counts)") {
    val df = fixture(500)
    val naive = df.withColumn("i",
      row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
    for (buckets <- Seq(1, 7, 64, 700)) {
      val dec = Ranks.bucketRange(df, Seq(col("v").desc, col("id").asc), buckets = buckets)
        .withRowNumber("i").result
      assert(dec.join(naive.withColumnRenamed("i", "i0"), Seq("id", "v", "size"))
        .filter(col("i") =!= col("i0")).count() === 0, s"buckets=$buckets")
      assert(dec.count() === 500)
    }
  }

  test("decomposed running sum == Window.orderBy cumsum; totals exact") {
    val df = fixture(300)
    val w = Window.orderBy(col("id").asc).rowsBetween(Window.unboundedPreceding, 0)
    val naive = df.withColumn("c0", sum("size").over(w))
    val b = Ranks.bucketRange(df, Seq(col("id").asc), valueCols = Seq("size"), buckets = 16)
    val dec = b.withCumSum("size", "c").result
    assert(dec.join(naive, Seq("id", "v", "size"))
      .filter(col("c") =!= col("c0")).count() === 0)
    assert(b.valueTotal("size") === df.agg(sum("size")).as[Long].head())
    assert(b.rowTotal === 300L)
  }

  test("decomposed NTILE == Spark ntile for n in {2,3,10,97} including total<n") {
    for (rows <- Seq(5, 96, 100); n <- Seq(2, 3, 10, 97)) {
      val df = fixture(rows)
      val naive = df.withColumn("t0",
        ntile(n).over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
      val dec = Ranks.bucketRange(df, Seq(col("v").asc, col("id").asc), buckets = 8)
        .withRowNumber("i").withNtile("i", n, "t").result
      assert(dec.join(naive, Seq("id", "v", "size"))
        .filter(col("t") =!= col("t0")).count() === 0, s"rows=$rows n=$n")
    }
  }

  test("99%-tied order keys with an id tiebreak still range-partition into " +
    "balanced buckets (sampled boundaries split inside the tie run)") {
    // the skew that kills a naive hash-on-first-column scheme: nearly all
    // rows share the leading order value. The order is TOTAL (id breaks
    // ties), so repartitionByRange can cut inside the tied run — no bucket
    // may hold the whole tie population.
    val df = (0 until 2000).map(i => (i.toLong, if (i % 100 == 0) i.toLong else 7L))
      .toDF("id", "v")
    val b = Ranks.bucketRange(df, Seq(col("v").asc, col("id").asc), buckets = 16)
    val sizes = b.df.groupBy(Ranks.BucketCol).count()
      .collect().map(_.getLong(1))
    assert(sizes.sum === 2000)
    assert(sizes.max <= 2 * (2000 / 16 + 1),
      s"hot bucket under tie skew: ${sizes.mkString(",")}")
    // and the statistic itself stays exact
    val naive = df.withColumn("i0",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(b.withRowNumber("i").result.join(naive, Seq("id", "v"))
      .filter(col("i") =!= col("i0")).count() === 0)
  }

  test("grouped decomposition == Window.partitionBy(group) row_number, " +
    "with one dominant group, a null group, and group totals exact") {
    // 90% of rows in group "big" — the skew a partitionBy(group) window
    // concentrates into one task; the grouped decomposition must split it
    // across buckets and still agree bit-for-bit
    val df = (0 until 1000).map { i =>
      (i.toLong, if (i % 10 == 0) (if (i % 20 == 0) "small" else null) else "big",
        (i * 7 % 97).toLong)
    }.toDF("id", "grp", "score")
    val naive = df.withColumn("r0", row_number()
      .over(Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)).cast("long"))
      .withColumn("n0", count(lit(1)).over(Window.partitionBy("grp")))
    val b = Ranks.groupedBucketRange(df, "grp",
      Seq(col("score").desc, col("id").asc), buckets = 16)
    val dec = b.withRowNumber("r").withGroupCount("n").result
    assert(dec.join(naive, Seq("id", "score")) // grp may be null — join on id
      .filter(col("r") =!= col("r0") || col("n") =!= col("n0")).count() === 0)
    // the dominant group spans several buckets (no single-task sort)
    val bigBuckets = b.df.filter(col("grp") === "big")
      .select(Ranks.BucketCol).distinct().count()
    assert(bigBuckets >= 4, s"dominant group concentrated in $bigBuckets bucket(s)")
    // fail-fast for high-cardinality groups
    val wide = (0 until 500).map(i => (i.toLong, s"g$i")).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Ranks.groupedBucketRange(wide, "grp", Seq(col("id").asc), maxGroups = 100)
    }
  }

  test("grouped cumsum == Window.partitionBy(group) running sum under skew") {
    val df = (0 until 800).map { i =>
      (i.toLong, if (i % 8 == 0) "minor" else "major", (i % 13 + 1).toLong)
    }.toDF("id", "grp", "n")
    val naive = df.withColumn("c0", sum("n").over(
      Window.partitionBy("grp").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val dec = Ranks.groupedBucketRange(df, "grp", Seq(col("id").asc),
        valueCols = Seq("n"), buckets = 16)
      .withCumSum("n", "c").result
    assert(dec.join(naive, Seq("id", "grp", "n"))
      .filter(col("c") =!= col("c0")).count() === 0)
  }

  test("groupedTopK == per-group rank filter; local pruning loses nothing") {
    val df = (0 until 1000).map { i =>
      (i.toLong, s"g${i % 3}", (i * 31 % 101).toLong)
    }.toDF("id", "grp", "score").repartition(13) // many partitions: real pruning
    val naive = df.withColumn("r0", row_number().over(
        Window.partitionBy("grp").orderBy(col("score").desc, col("id").asc)).cast("long"))
      .filter(col("r0") <= 5)
    val dec = Ranks.groupedTopK(df, "grp",
      Seq(col("score").desc, col("id").asc), 5, "r")
    assert(dec.count() === naive.count())
    assert(dec.join(naive, Seq("id", "grp", "score"))
      .filter(col("r") =!= col("r0")).count() === 0)
  }

  test("empty input yields empty output, no analysis error") {
    val df = fixture(0)
    val b = Ranks.bucketRange(df, Seq(col("id").asc), valueCols = Seq("size"))
    assert(b.withRowNumber("i").withCumSum("size", "c").result.count() === 0)
    assert(b.rowTotal === 0L && b.valueTotal("size") === 0L)
  }

  test("plan has no SinglePartition exchange and no unpartitioned window") {
    val dec = Ranks.bucketRange(fixture(100), Seq(col("v").asc, col("id").asc),
      valueCols = Seq("size"), buckets = 8)
      .withRowNumber("i").withCumSum("size", "c").result
    val plan = dec.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
