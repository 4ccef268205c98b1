package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the FINAL (post-AQE) executed plan of a declared query after
  * actually running it — PlanProbe shows the initial adaptive plan where
  * join strategies are still undecided; runtime hazards (a corpus-derived
  * broadcast the static plan hid behind AQE) only show here.
  * Usage: Test/runMain graft.tools.ExecPlanProbe <sfDir> <query>
  */
object ExecPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    // Execute THIS QueryExecution, not a derived one: df.count() builds a
    // separate QueryExecution (groupBy().count()), leaving
    // df.queryExecution's AdaptiveSparkPlanExec un-executed — the print
    // below would show the INITIAL adaptive plan (isFinalPlan=false),
    // i.e. exactly what PlanProbe already shows (r12 ADVICE). Driving the
    // plan's own toRdd forces AQE to re-plan and finalize every stage.
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val p = df.queryExecution.executedPlan.toString
    println(p.split("\n").filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate") ||
        l.contains("Sort") || l.contains("Scan") || l.contains("Broadcast"))
      .mkString("\n"))
    spark.stop()
  }
}
