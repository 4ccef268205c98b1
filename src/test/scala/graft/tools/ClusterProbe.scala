package graft.tools

import graft.Tables
import graft.operators.{Corpus, Dedup, TextAnalysis => TA}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing probe for q_dedup_cluster: where do the seconds go —
  * signature kernels, the star windows, CC rounds, or assembly? Run:
  * sbt "Test/runMain graft.tools.ClusterProbe /root/testdata/sf0.1 3". */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      val d = Tables(spark, dir, "documents")
      val id = col("doc_id")
      val pid = (id / 10).cast("long")
      val url = when(pmod(id, lit(10)) === 0,
          concat(lit("https://example.org/p/"), pid))
        .when(pmod(id, lit(10)) === 1,
          concat(lit("HTTPS://WWW.EXAMPLE.ORG:443/p/"), pid,
            lit("?utm_source=feed&utm_medium=rss#sec")))
        .otherwise(concat(lit("https://example.org/u/"), id))
      val sig = d.select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("s_text"),
        TA.minShingleFingerprint(col("text"), 8).as("s_shingle"),
        Corpus.canonicalUrl(url).as("s_url"))
        .persist()
      time("sig build")(sig.count())
      def star(c: String) =
        sig.filter(col(c).isNotNull)
          .select(col("doc_id").as("src"),
            min("doc_id").over(Window.partitionBy(col(c))).as("dst"))
          .filter(col("src") =!= col("dst"))
      val edges = star("s_text").union(star("s_shingle")).union(star("s_url"))
      val edgesMat = time("star edges")(edges.localCheckpoint(true))
      println(s"PROBE n_edges        ${edgesMat.count()}")
      val comp = time("cc")(Dedup.connectedComponents(edgesMat, "src", "dst"))
      time("cc count")(comp.count())
      sig.unpersist()
      val out = d.select(col("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
        .orderBy("doc_id")
      time("assembly")(out.count())
    }
    spark.stop()
  }
}
