package graft.batch

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The two scale techniques that do not show up in a declared query but
  * matter at 100 TB: skew-salted aggregation and bucketed co-located
  * joins (shuffle elimination proven on the physical plan). */
class ScaleTechniquesSpec extends SparkTestBase {

  test("salted aggregation equals direct aggregation on skewed data") {
    import spark.implicits._
    // 90% of rows on one hot key
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${i % 97}"
      (k, (i % 50).toDouble)
    }
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SaltedAgg.sumCountByKey(
        df.withColumn("v", col("v").cast("decimal(18,2)")), Seq("k"), col("v"), salt = 16)
      .select(col("k"), col("sum_value").cast("double"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (0L until 1000L).map(i => (i, s"r$i")).toDF("id", "rv")
    left.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bl")
    right.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("br")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bl").join(spark.table("br"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bl")
      spark.sql("DROP TABLE IF EXISTS br")
    }
  }
}
