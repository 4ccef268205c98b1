package graft

import graft.operators.DataQuality
import graft.operators.DataQuality.{Check, UniqueCheck}
import org.apache.spark.sql.functions._

/** Threshold semantics, null handling and ppm flooring for the one-scan
  * expectations suite (q_data_quality is the oracle-checked twin). */
class DataQualitySpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), -5.0),
    (3L, None, 20.0),
    (3L, Some("d"), 30.0) // duplicate id
  ).toDF("id", "name", "v")

  test("conditional counts treat null predicate inputs as failures") {
    val r = DataQuality.report(df, Seq(Check("complete", "name", col("name").isNotNull)))
      .collect().head
    assert(r.getAs[Long]("metric_ppm") === 750000L) // 3 of 4, floored
    assert(r.getAs[Long]("passed") === 0L)
  }

  test("threshold boundary is inclusive and ppm floors") {
    val pass = DataQuality.report(df,
      Seq(Check("range", "v", col("v") >= 0, thresholdPpm = 750000L))).collect().head
    assert(pass.getAs[Long]("metric_ppm") === 750000L && pass.getAs[Long]("passed") === 1L)
    val fail = DataQuality.report(df,
      Seq(Check("range", "v", col("v") >= 0, thresholdPpm = 750001L))).collect().head
    assert(fail.getAs[Long]("passed") === 0L)
  }

  test("uniqueness is exact distinct over rows") {
    val r = DataQuality.report(df, Nil, Seq(UniqueCheck("id"))).collect().head
    assert(r.getAs[String]("check_name") === "unique")
    assert(r.getAs[Long]("metric_ppm") === 750000L) // 3 distinct of 4 rows
    assert(r.getAs[Long]("passed") === 0L)
  }

  test("empty input degrades to null metrics and failed checks, never throws") {
    val empty = df.filter(col("id") < 0)
    val rows = DataQuality.report(empty,
      Seq(Check("complete", "name", col("name").isNotNull)), Seq(UniqueCheck("id")))
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("metric_ppm"))) // 0 div 0 = null, not a crash
      assert(r.getAs[Long]("passed") === 0L) // null metric can never pass
    }
  }

  test("full suite emits one sorted row per check") {
    val r = DataQuality.report(df,
      Seq(Check("complete", "name", col("name").isNotNull),
        Check("range", "v", col("v") >= 0)),
      Seq(UniqueCheck("id")))
    assert(r.columns.toSeq === Seq("check_name", "col_name", "metric_ppm", "passed"))
    assert(r.collect().map(_.getString(0)).toSeq === Seq("complete", "range", "unique"))
  }
}
