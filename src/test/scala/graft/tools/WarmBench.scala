package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm A/B timing probe (test scope — never ships in the artifact).
  *
  * Usage: sbt "Test/runMain graft.tools.WarmBench <sfDir> <runs> <query>..."
  * Warms the JVM + file cache with one untimed pass of each query, then
  * times `runs` passes each on the SAME session — isolating plan cost from
  * cold-JIT / cold-page-cache noise, which on this shared host inflates
  * single cold runs 1.5-3x (see tools/bench_history.md).
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    val queries =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q_offset_dedup", "q_simhash", "q_minhash_lsh")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (q <- queries) graft.SparkEntry.queries(q)(spark, sfDir).count() // warm
      for (q <- queries; i <- 1 to runs) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        println(f"WARMBENCH $q run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } finally spark.stop()
  }
}
