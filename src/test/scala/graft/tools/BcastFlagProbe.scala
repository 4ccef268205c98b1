package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug companion to PlanAudit's checkpoint-broadcast sweep: prints the
  * build subtree of every flagged broadcast so the adjudication (fix vs
  * allowlist) reads the actual plan, not a guess.
  * Usage: Test/runMain graft.tools.BcastFlagProbe <sfDir> <query>...
  */
object BcastFlagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.SparkPlan
    def bounded(n: SparkPlan): Boolean = {
      val c = n.getClass.getSimpleName
      c.contains("Aggregate") || c.contains("Limit") || c.contains("TakeOrdered")
    }
    def reaches(n: SparkPlan): Boolean =
      if (bounded(n)) false
      else if (n.isInstanceOf[org.apache.spark.sql.execution.RDDScanExec]) true
      else n.children.exists(reaches)
    args.drop(1).foreach { q =>
      val p = graft.SparkEntry.queries(q)(spark, args(0)).queryExecution.sparkPlan
      p.foreach {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
          val b = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          if (reaches(b)) {
            println(s"=== $q: BHJ ${j.joinType} keys=${j.leftKeys.mkString(",")} builds:")
            println(b.treeString.split("\n").take(8).mkString("\n"))
          }
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
          val b = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case _ => j.right
          }
          if (reaches(b)) {
            println(s"=== $q: BNLJ ${j.joinType} builds:")
            println(b.treeString.split("\n").take(8).mkString("\n"))
          }
        case _ => ()
      }
    }
    spark.stop()
  }
}
