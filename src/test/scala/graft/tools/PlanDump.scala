package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for a list of declared queries to files —
  * the r15 plans/ deliverable. Usage:
  *   Test/runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q>...
  * writes <outDir>/<q>_<suffix>.txt per query. The initial adaptive plan
  * is what explain prints pre-execution; it carries the Exchange count,
  * join strategies, PushedFilters and ReadSchema the optimization notes
  * reference.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val queries = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (q <- queries) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), txt)
        println(s"PLANDUMP $q -> $outDir/${q}_$suffix.txt")
      } catch {
        case e: Throwable => System.err.println(s"PLANDUMP $q FAILED: $e")
      }
    }
    spark.stop()
  }
}
