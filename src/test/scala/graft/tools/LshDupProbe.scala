package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: how much of the LSH candidate stream is
  * band-duplication (the same (doc1, doc2) pair emitted from multiple
  * colliding bands)? This factor is what a min-band emission rule would
  * remove BEFORE the pair-dedup aggregate — the aggregate's input volume
  * is exactly what spills at x30 (SCALING.md footprint: 16 GiB on
  * q_dedup_ngram_auto). Run on the auto query's hot leg shape:
  *   Test/runMain graft.tools.LshDupProbe <sfDir> [maxBucket]
  */
object LshDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxBucket = args.lift(1).map(_.toInt).getOrElse(800)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir, "documents")
    // the auto query's hot leg: lang blocks above cap 100 -> minhash over
    // those docs with bucket cap 8*100
    // NULL-SAFE split, matching Dedup.splitByHotBlocks' <=> semantics (a
    // NULL lang is a real block there — a plain isin never matches NULL
    // and would silently drop a hot null-lang block from the probe while
    // the real Auto route LSHes it)
    val hotLangs = docs.groupBy("lang").count().filter(col("count") > 100)
      .select("lang").collect().map(r => Option(r.getString(0))).toSet
    val nonNull = hotLangs.flatten.toSeq
    val base = if (nonNull.nonEmpty) col("lang").isin(nonNull: _*) else lit(false)
    val hot = docs.filter(
      if (hotLangs.contains(None)) base || col("lang").isNull else base)
    println(s"[probe] hot langs: ${hotLangs.size}, hot docs: ${hot.count()}")
    val raw = graft.operators.Dedup.bandJoinRawForProbe(
      hot, "doc_id", "text", k = 3, bands = 16, rowsPerBand = 4, maxBucket)
    val total = raw.count()
    val distinctPairs = raw.select("doc1", "doc2").distinct().count()
    println(f"[probe] band-join rows: $total%,d  distinct pairs: $distinctPairs%,d  dup factor: ${total.toDouble / math.max(1, distinctPairs)}%.2f")
    spark.stop()
  }
}
