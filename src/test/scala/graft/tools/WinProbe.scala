package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
object WinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        val s = try qe.executedPlan.toString catch { case _: Throwable => return }
        val nodes = graft.PlanAudit.windowOverSinglePartitionNodes(s)
        if (nodes.nonEmpty)
          println(s"=== WINDOW HIT (func=$f) ===\n" +
            nodes.map(n => s"NODE: $n").mkString("\n") + "\n" +
            s.split("\n").take(25).mkString("\n"))
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    // write like Verify does — count() prunes unreferenced Window columns
    graft.SparkEntry.queries(args(1))(spark, args(0)).coalesce(1)
      .write.mode("overwrite").parquet(s"/tmp/winprobe_${args(1)}")
    org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
    spark.stop()
  }
}
