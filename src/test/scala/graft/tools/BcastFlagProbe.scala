package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug companion to PlanAudit's checkpoint-broadcast sweep: prints the
  * build subtree of every flagged broadcast so the adjudication (fix vs
  * allowlist) reads the actual plan, not a guess. Consumes the SAME
  * detector as the sweep ([[graft.PlanAudit.broadcastBuildsOverRddScan]])
  * — a private copy of the walk would silently diverge from the audit it
  * debugs.
  * Usage: Test/runMain graft.tools.BcastFlagProbe <sfDir> [--count] <query>...
  * `--count` probes the COUNT-shaped plan (`groupBy().count()` over the
  * query) instead of the full-output plan — the shape Footprint/Bench
  * execute, whose column pruning renders the same builds with narrower
  * projections than Verify's write-shaped plan (r14 x30 sweep
  * adjudication).
  */
object BcastFlagProbe {
  def main(args: Array[String]): Unit = {
    val b0 = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    // same reliable-lineage passthrough as Verify: probe the plan shapes
    // the conf actually produces (r15 mode-parity adjudication)
    val spark = sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
      .fold(b0)(d => b0.config(graft.operators.Lineage.ConfKey, d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val countShape = args.contains("--count")
    args.drop(1).filterNot(_ == "--count").foreach { q =>
      val df0 = graft.SparkEntry.queries(q)(spark, args(0))
      val df = if (countShape) df0.groupBy().count() else df0
      val p = df.queryExecution.sparkPlan
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
