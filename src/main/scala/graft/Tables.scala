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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) which Spark 4 refuses to read as a
      // timestamp; read it as a Long (nanoseconds since epoch) instead.
      // Queries derive milliseconds via integer division (`ts div 1000000`),
      // matching DuckDB's epoch_ms() truncation of the same nanos.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
