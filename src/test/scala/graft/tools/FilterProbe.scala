package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.functions.PushdownBarrier
object FilterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("text").isNotNull)
    def time(tag: String)(f: => Any): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def force(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(length(col("verdict")))).head()
    def verdictOf(chars: org.apache.spark.sql.Column, rep: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
      when(chars < 100, "too_short").when(rep > 35000, "repetitive")
        .when(q < 400000, "low_quality").otherwise("pass")
    // (a) inline CASE over raw signal expressions
    time("inline-case")(force(d.select(verdictOf(length(col("text")).cast("long"),
      graft.functions.RepetitionPpm(col("text"), 3),
      TextAnalysis.qualityScorePpm(col("text"))).as("verdict"))))
    // (b) signals behind numeric barriers, CASE over plain columns
    val sigB = d.select(
      PushdownBarrier.long(length(col("text")).cast("long")).as("__chars"),
      PushdownBarrier.long(graft.functions.RepetitionPpm(col("text"), 3)).as("__rep"),
      PushdownBarrier.long(TextAnalysis.qualityScorePpm(col("text"))).as("__q"))
    time("barrier-signals")(force(sigB.select(
      verdictOf(col("__chars"), col("__rep"), col("__q")).as("verdict"))))
    // (c) each signal forced alone (sum) for a baseline
    time("rep-alone")(d.agg(sum(graft.functions.RepetitionPpm(col("text"), 3))).head())
    time("quality-alone")(d.agg(sum(TextAnalysis.qualityScorePpm(col("text")))).head())
    spark.stop()
  }
}
