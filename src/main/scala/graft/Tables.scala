package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and reads through here, so filters
  * and projections declared downstream reach the parquet scan (predicate
  * pushdown / column pruning) — at 100 TB the scan is the dominant cost.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan fan-out for unsplittable KERNEL-HEAVY inputs (r15). The driver
    * ships each table as ONE parquet file with ONE row group, and a row
    * group is read by exactly one task — so every scan-stage computation
    * ran single-threaded regardless of core count. For the relational
    * tables that is immaterial (the first shuffle parallelizes the work
    * and an extra exchange measurably LOSES — A/B'd at sf0.1:
    * q_market_basket 1.5→2.3 s, q_pagerank 6→8 s warm-best), but the
    * text/vector tables feed per-row kernels (min-shingle fingerprints,
    * MinHash signatures, quality scores, dot products) that cost ~0.5 s
    * single-threaded per pass at sf0.1 — there the standard remedy for an
    * unsplittable input (spark_optimization_guide §2.5, repartition
    * immediately after the read) wins. SCALE-ADAPTIVE, not local tuning:
    * when the scan already yields the session's default parallelism (any
    * real multi-file / multi-row-group layout — the 100 TB case) it is a
    * no-op. Filters and pruning still push through the round-robin
    * exchange to the scan. */
  private val kernelTables = Set("documents", "embeddings")
  private def fanOut(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
    if (!kernelTables.contains(name)) return df
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Query-level fan-out seam for an unsplittable relational scan feeding
    * an expensive SELF-JOIN (pair generation): hash-repartition on the
    * join key — no round-robin pre-sort, and the exchange IS the join's
    * required distribution, so nothing extra moves — but only when the
    * scan yields fewer partitions than the session's parallelism (the
    * single-row-group case; a no-op on any real multi-file layout, so the
    * 100 TB plan shape is untouched). A Tables-level variant for ALL
    * relational reads was measured and REJECTED in r15: it broke the
    * one-slim-shuffle / pruning plan audits of eleven scan-aggregate
    * queries for a win that only exists at local file sizes. */
  def fanOutOn(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      // Contract for every events query: `ts` is a LONG of nanoseconds
      // since epoch, so `ts div 1000000` is the millisecond timestamp that
      // DuckDB's epoch_ms(ts) produces on the same rows. The driver has
      // shipped the column as TIMESTAMP(NANOS) (readable only via
      // nanosAsLong) and as TIMESTAMP(MICROS) (which Spark 4 reads as
      // TIMESTAMP_NTZ) — normalize both to the Long-nanos contract here so
      // the queries and their oracles never track the physical type.
      // timestampdiff is timezone-free on NTZ (no session-tz dependence).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => df
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000L"))
        case org.apache.spark.sql.types.TimestampType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.unix_micros(
              org.apache.spark.sql.functions.col("ts")) * 1000L)
        case other =>
          throw new IllegalStateException(s"events.ts unsupported type: $other")
      }
    } else fanOut(spark, name, spark.read.parquet(s"$sfDir/$name.parquet"))
  }
}
