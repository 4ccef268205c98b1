package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** The pure-SQL surface: after Catalog.register, oracle-style SQL runs
  * unchanged against the engine, with pushdown intact through the views.
  */
class CatalogSpec extends SparkTestBase {

  test("registered views answer oracle-style SQL identically to the DataFrame path") {
    val dir = "/root/testdata/sf0.001"
    Catalog.register(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_quantity <= 25
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    val df = Tables(spark, dir, "lineitem")
      .filter(col("l_quantity") <= 25)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy("l_returnflag").collect()
    assert(sql.map(_.toSeq).toSeq == df.map(_.toSeq).toSeq)
  }

  test("pushdown survives the view: the filter reaches the parquet scan") {
    Catalog.register(spark, "/root/testdata/sf0.001")
    val plan = spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity <= 5")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThanOrEqual(l_quantity,5"),
      s"filter not pushed through the view:\n${plan.take(600)}")
  }

  test("every driver table is queryable by name") {
    Catalog.register(spark, "/root/testdata/sf0.001")
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT COUNT(*) FROM $n").head().getLong(0) > 0,
        s"table $n empty or unregistered")
    }
  }
}
