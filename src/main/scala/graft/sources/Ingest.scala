package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import graft.operators.Lineage.LineageOps

/** Schema-explicit text-format ingestion with an explicit reject leg —
  * the route/reject discipline (media parsers, `q_media_quality`) applied
  * to CSV/JSONL intake: a 100 TB crawl drop always contains malformed
  * lines, and silently nulling them (Spark's default PERMISSIVE read)
  * corrupts downstream counts. Both readers parse once in PERMISSIVE
  * mode with a named corrupt-record column and split the result into
  * (good, rejects-with-raw-line).
  *
  * The parsed frame is eagerly local-checkpointed before the split:
  * Spark refuses a filter that references ONLY the internal
  * corrupt-record column of a live scan (SPARK-21610), the checkpoint
  * guarantees the two legs split one parse instead of re-reading the
  * files, and — unlike persist() — it registers nothing with the cache
  * manager: its blocks are reclaimed when the caller drops both legs
  * (the connectedComponents handoff discipline; a persist here would be
  * an unreleasable session-lived cache entry). At cluster scale swap
  * for checkpoint() against a reliable dir.
  */
object Ingest {

  private val CORRUPT = "_corrupt_record"

  private def withRejects(df: DataFrame, schema: StructType): (DataFrame, DataFrame) = {
    val parsed = df.lineageCut()
    val good = parsed.filter(col(CORRUPT).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = parsed.filter(col(CORRUPT).isNotNull)
      .select(col(CORRUPT).as("raw_line"))
    (good, bad)
  }

  /** CSV with header; malformed lines (arity/type errors) → reject leg. */
  def csvWithRejects(spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame) =
    withRejects(
      spark.read.schema(schema.add(CORRUPT, StringType))
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .csv(path),
      schema)

  /** JSON-lines; unparsable lines → reject leg. */
  def jsonlWithRejects(spark: SparkSession, path: String, schema: StructType):
      (DataFrame, DataFrame) =
    withRejects(
      spark.read.schema(schema.add(CORRUPT, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
        .json(path),
      schema)
}
