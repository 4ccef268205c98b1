package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = graft.SparkEntry.queries(args(1))(spark, args(0))
      .queryExecution.executedPlan.toString
    println(p.split("\n").filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate")).mkString("\n"))
    spark.stop()
  }
}
