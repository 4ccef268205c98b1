package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: what size statistics does a [[graft.operators.Lineage.cut]]
  * result expose to the planner, per mode? The r15 mode-parity sweep
  * caught reliable-mode runs planning broadcasts that default mode does
  * not (q_triangles' corpus-sized oriented edge table) — whether that is
  * a hazard hinges on whether the checkpointed LogicalRDD's stats are
  * measured-exact (a small build at small scale is then legitimate
  * adaptivity that re-makes itself at 100 TB) or a bogus constant (the
  * planner would broadcast a 100 TB table). Prints sizeInBytes for the
  * same dataframe cut in default (localCheckpoint) and reliable
  * (persist -> checkpoint -> unpersist) mode, at two sizes, plus the
  * uncut plan's estimate.
  *
  * Usage: Test/runMain graft.tools.CkptStatsProbe
  */
object CkptStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // second mode: cost-annotated optimized plan of a declared query in
    // the CURRENT Lineage mode — `CkptStatsProbe <sfDir> <query>`
    if (args.length >= 2) {
      sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
        .foreach(d => spark.conf.set(graft.operators.Lineage.ConfKey, d))
      val df = graft.SparkEntry.queries(args(1))(spark, args(0))
      println(df.queryExecution.stringWithStats)
      spark.stop()
      return
    }

    def df(n: Long) = spark.range(n)
      .select(col("id").as("u"), (col("id") * 7 % 1000).as("v"),
        (col("id") % 13).as("w"))

    Seq(10000L, 3000000L).foreach { n =>
      val base = df(n)
      println(s"n=$n uncut estimate: " +
        base.queryExecution.optimizedPlan.stats.sizeInBytes)
      spark.conf.unset(graft.operators.Lineage.ConfKey)
      val local = graft.operators.Lineage.cut(base)
      println(s"n=$n localCheckpoint stats: " +
        local.queryExecution.optimizedPlan.stats.sizeInBytes)
      spark.conf.set(graft.operators.Lineage.ConfKey, "/tmp/ckpt_stats_probe")
      val reliable = graft.operators.Lineage.cut(df(n))
      println(s"n=$n reliable checkpoint stats: " +
        reliable.queryExecution.optimizedPlan.stats.sizeInBytes)
      spark.conf.unset(graft.operators.Lineage.ConfKey)
    }
    spark.stop()
  }
}
