import org.apache.spark.sql.SparkSession
object TimeProbe extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
    .config("spark.driver.memory","16g").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.1"
  // warmup
  graft.SparkEntry.queries("q_topk")(spark, dir).count()
  for (q <- Seq("q_minhash_lsh", "q_dedup_lsh_verified"); i <- 1 to 2) {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(q)(spark, dir).count()
    println(s"TIME $q run$i ${(System.nanoTime()-t0)/1e9}")
  }
  val p = graft.SparkEntry.queries("q_minhash_lsh")(spark, dir)
  p.count()
  val ps = p.queryExecution.executedPlan.toString
  println("REUSE_MARKERS=" + "(ReusedExchange|ReusedQueryStage|ShuffleQueryStage)".r.findAllIn(ps).size)
  spark.stop()
}
