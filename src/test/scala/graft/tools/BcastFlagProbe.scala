package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug companion to PlanAudit's checkpoint-broadcast sweep: prints the
  * build subtree of every flagged broadcast so the adjudication (fix vs
  * allowlist) reads the actual plan, not a guess. Consumes the SAME
  * detector as the sweep ([[graft.PlanAudit.broadcastBuildsOverRddScan]])
  * — a private copy of the walk would silently diverge from the audit it
  * debugs.
  * Usage: Test/runMain graft.tools.BcastFlagProbe <sfDir> <query>...
  */
object BcastFlagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val p = graft.SparkEntry.queries(q)(spark, args(0)).queryExecution.sparkPlan
      graft.PlanAudit.broadcastBuildsOverRddScan(p).foreach { case (kind, build) =>
        // first line = the sweep's exact description (what an allowlist
        // pattern must match), then the subtree for adjudication
        println(s"=== $q: $kind builds over ${build.nodeName}[${build.output.map(_.name).mkString(",")}]")
        println(build.treeString.split("\n").take(8).mkString("\n"))
      }
    }
    spark.stop()
  }
}
