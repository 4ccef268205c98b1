package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Registers every driver-provided table as a temp view, so a pure-SQL
  * user (spark.sql / thrift-style sessions with GraftExtensions active)
  * can run the whole suite's surface by table name — the same names the
  * DuckDB oracles use, so SQL written against the oracle runs unchanged
  * against the engine. Registration is by-name lazy plans: nothing is
  * scanned until a query runs, and every query still gets pushdown and
  * pruning through the view.
  */
object Catalog {
  def register(spark: SparkSession, sfDir: String): Unit =
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
