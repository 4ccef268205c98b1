package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite evaluated in ONE scan — the
  * "expectations" pass a pipeline runs before admitting a 100 TB batch.
  *
  * Every row-level check compiles to a conditional count inside a single
  * aggregate, so the whole suite costs one map-side-combining pass over
  * the table regardless of how many checks are declared; uniqueness
  * checks add exact `count(distinct)` columns (Catalyst plans them via
  * Expand — one extra slim shuffle, still one file scan). Metrics are
  * integer ppm (floor), so the report is engine-exact and
  * oracle-checkable with no float tolerance.
  *
  * The output is one row per check: (check, column, metric_ppm, passed)
  * with `passed` = metric_ppm >= threshold_ppm.
  */
object DataQuality {

  /** A row-level constraint: `predicate` is the per-row pass condition. */
  final case class Check(name: String, column: String, predicate: Column,
                         thresholdPpm: Long = 1000000L)

  /** Uniqueness constraint: distinct(column) / rows, in ppm. */
  final case class UniqueCheck(column: String, thresholdPpm: Long = 1000000L)

  def report(df: DataFrame, checks: Seq[Check], uniques: Seq[UniqueCheck] = Nil): DataFrame = {
    require(checks.nonEmpty || uniques.nonEmpty, "empty check suite")
    val aggs =
      checks.zipWithIndex.map { case (c, i) =>
        count(when(c.predicate, lit(1))).as(s"c$i")
      } ++ uniques.zipWithIndex.map { case (u, i) =>
        countDistinct(col(u.column)).as(s"u$i")
      }
    val one = df.agg(count(lit(1)).as("n"), aggs: _*)
    // n = 0 (empty input) must degrade to a null metric + failed check,
    // not an ANSI DIVIDE_BY_ZERO (DataQualitySpec pins this)
    def ppm(c: String) = s"CASE WHEN n = 0 THEN CAST(NULL AS BIGINT) ELSE $c * 1000000 div n END"
    val rows =
      checks.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"), lit(c.column).as("col_name"),
          expr(ppm(s"c$i")).as("metric_ppm"),
          expr(s"CASE WHEN ${ppm(s"c$i")} >= ${c.thresholdPpm}L THEN 1L ELSE 0L END").as("passed"))
      } ++ uniques.zipWithIndex.map { case (u, i) =>
        struct(lit("unique").as("check_name"), lit(u.column).as("col_name"),
          expr(ppm(s"u$i")).as("metric_ppm"),
          expr(s"CASE WHEN ${ppm(s"u$i")} >= ${u.thresholdPpm}L THEN 1L ELSE 0L END").as("passed"))
      }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.check_name"), col("r.col_name"), col("r.metric_ppm"), col("r.passed"))
      .orderBy("check_name", "col_name")
  }
}
