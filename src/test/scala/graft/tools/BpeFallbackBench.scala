package graft.tools

import graft.Tables
import graft.operators.BpeTrainer
import org.apache.spark.sql.SparkSession

/** Measured run of the ABOVE-CAP BPE fallback (test scope): forces the
  * batched distributed merge loop (`maxVocabRows = 0`) over a real text
  * corpus and reports merges learned, counting jobs (rounds) taken,
  * merges/job, and wall time — the round-11 "batch the fallback" done-bar
  * measurement. The r10 fallback paid one Spark job per merge (~0.1 s of
  * pure scheduling each, ~100 s for 1000 merges before any work); the
  * batched loop amortizes that by the average batch size.
  *
  * Usage: sbt "Test/runMain graft.tools.BpeFallbackBench [sfDir] [merges]"
  */
object BpeFallbackBench {

  /** Deterministic Zipf-weighted random-word corpus (seeded) — the
    * driver testdata's documents tables are templated bags of ~31
    * dictionary words, which exhaust BPE at <100 merges and say nothing
    * about the >1M-word-type corpora the above-cap route exists for.
    * Letters are drawn from an English-like skewed distribution so pair
    * contexts concentrate the way real text does (uniform letters would
    * flatter the batcher). */
  def synthCorpus(spark: SparkSession, types: Int, seed: Long = 42L)
      : org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    val letters = "eeeeetttaaooiinnssrrhhldcumfpgwybvkxjqz"
    val words = scala.collection.mutable.LinkedHashSet[String]()
    while (words.size < types) {
      val len = 3 + rnd.nextInt(10)
      words += (0 until len).map(_ => letters(rnd.nextInt(letters.length))).mkString
    }
    val rows = words.toSeq.zipWithIndex.map { case (w, r) =>
      val freq = math.max(1, 30000 / (r + 30)) // Zipf-ish head, flat tail
      ((w + " ") * freq).trim
    }
    import spark.implicits._
    rows.toDF("text")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = args.lift(1).map(_.toInt).getOrElse(1000)
    val synthTypes = args.lift(2).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // r14 (judge #1): the above-cap merge rounds only execute HERE (the
    // declared q_bpe_learn at sf0.01 stays under the vocab cap), so this
    // bench is where their per-round counting jobs meet the runtime
    // sweep. Label = the declared query whose scale path this is.
    graft.RuntimeSweep.install(spark)
    graft.RuntimeSweep.label = "q_bpe_learn"
    val docs =
      if (synthTypes > 0) synthCorpus(spark, synthTypes).localCheckpoint(true)
      else Tables(spark, dir, "documents")
    // warm the scan + codegen so the timed run measures the loop
    docs.count()
    def run(label: String, cap: Long): Unit = {
      val t0 = System.nanoTime()
      val learned = BpeTrainer.learnMerges(docs, "text", merges, maxVocabRows = cap)
      val n = learned.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = BpeTrainer.lastDistributedRounds
      val actions = BpeTrainer.lastDistributedActions
      println(f"BPEFALLBACK $label cap=$cap%d merges=$n%d counting_jobs=$rounds%d " +
        f"actions=$actions%d merges_per_job=${n.toDouble / actions}%.1f " +
        f"wall=$sec%.1f s sf=$dir")
    }
    // leg 1: above-cap hybrid — a cap the corpus is genuinely above, so
    // the run starts distributed and recollects once shrunk under it
    val types = BpeTrainer.wordTypes(docs, "text")
    println(s"BPEFALLBACK corpus word types: $types")
    run("hybrid", math.max(1L, types / 2))
    // leg 2: pure batched loop (cap 0 disables recollect entirely) — the
    // fallback-of-the-fallback a never-shrinking corpus would run
    run("pure_batched", 0L)
    graft.RuntimeSweep.drain(spark)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("RUNTIME_SWEEP_bpe.json"),
      graft.RuntimeSweep.reportJson())
    println(s"[bpe] runtime sweep: ${graft.RuntimeSweep.executionsTotal} " +
      s"executed subplans, ${graft.RuntimeSweep.unexplainedTotal} unexplained, " +
      s"${graft.RuntimeSweep.detectorErrorsTotal} detector errors -> " +
      "RUNTIME_SWEEP_bpe.json")
    spark.stop()
  }
}
