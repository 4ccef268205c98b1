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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    import spark.implicits._
    // one hot key carrying ~50k rows vs a uniform right side; payloads
    // must be HIGH-ENTROPY — a constant pad compresses to almost nothing
    // in the shuffle and the hot partition never crosses the size
    // threshold; thresholds lowered so local-mode sizes qualify
    def pad(i: Int): String =
      java.lang.Long.toHexString(i * 0x9e3779b97f4a7c15L) * 8
    val left = ((1 to 50000).map(_ => 0) ++ (1 to 2000).map(i => i % 40))
      .zipWithIndex.map { case (k, i) => (k, pad(i)) }.toDF("k", "lv")
    val right = (0 until 40).flatMap(k => (1 to 50).map(i => (k, s"r$i")))
      .toDF("k", "rv")
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.coalescePartitions.enabled" -> spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled"),
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> spark.conf.getOption("spark.sql.adaptive.forceOptimizeSkewedJoin"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val joined = left.join(right, "k")
      // execute THIS queryExecution (count()/write() build a different
      // plan tree and would leave joined's adaptive plan unfinalized)
      val rows = joined.queryExecution.executedPlan.execute().count()
      assert(rows == 50000L * 50 + 2000 * 50)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "adaptive plan did not finalize")
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
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
