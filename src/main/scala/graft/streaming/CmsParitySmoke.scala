package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.sql.Timestamp

/** Stream↔batch parity for an INCREMENTALLY MAINTAINED Count-Min sketch:
  * per-source token-frequency sketches kept as per-key state through the
  * stateful surface, probed at the end and compared against the declared
  * batch path (built-in `count_min_sketch` aggregate + `cms_probe`) —
  * token for token, estimate for estimate, exactly.
  *
  * Why it must hold: CMS adds and merges are commutative elementwise
  * counter sums, so ANY partition/arrival order yields the same sketch
  * given the same (eps, confidence, seed). Unlike the bottom-k smoke, a
  * counting sketch is NOT idempotent under replay, so this smoke feeds
  * disjoint microbatches and relies on the engine's exactly-once
  * microbatch state commit (the checkpoint protocol proven by
  * ExternalPersistenceE2ESpec) — which is precisely the guarantee a
  * production streaming sketch needs from the engine.
  *
  * Exits 0 iff every (source, probe-token) estimate matches. Forked by
  * StreamBatchParitySpec (Spark 4.1 stateful exec NPEs under sbt test).
  */
object CmsParitySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val EPS = 0.001
    val CONF = 0.99
    val SEED = 42
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // probe set: first 12 distinct tokens in lexical order (deterministic)
    val words = Tables(spark, dir, "documents")
      .select(explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("w"))
    val probes = words.distinct().orderBy("w").limit(12)
      .collect().map(_.getString(0)).toSeq

    // ---- batch truth: built-in aggregate per source + cms_probe reads
    val sk = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("source")
      .agg(count_min_sketch(col("w"), lit(EPS), lit(CONF), lit(SEED)).as("sk"))
    val batch: Map[(String, String), Long] =
      sk.crossJoin(probes.toDF("token"))
        .select(col("source"), col("token"),
          graft.functions.CmsProbe(col("sk"), col("token")).as("est"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // ---- streaming: one Record per document keyed by source; the fold
    // adds every token of the doc into the per-source sketch bytes
    def ser(c: CountMinSketch): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); c.writeTo(bos); bos.toByteArray
    }
    def addAll(bytes: Array[Byte], text: String): Array[Byte] = {
      val c = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      val m = java.util.regex.Pattern.compile("[a-z]+").matcher(text)
      while (m.find()) c.addBinary(m.group.getBytes("UTF-8"))
      ser(c)
    }
    val empty = ser(CountMinSketch.create(EPS, CONF, SEED))
    val fold = FoldOption.of[Array[Byte], Record] { r =>
      addAll(empty, new String(r.value, "UTF-8"))
    } { (st, r) => addAll(st, new String(r.value, "UTF-8")) }

    val docs = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._2)
    val feed = docs.zipWithIndex.map { case ((src, _, text), seq) =>
      Record("docs", 0, seq.toLong, new Timestamp(0L), 0, src,
        text.getBytes("UTF-8"), Map.empty)
    }

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("cmsparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cmsparity").toString)
      .start()
    // disjoint microbatches: counting state is exactly-once territory
    val thirds = Seq(feed.length / 3, feed.length * 2 / 3)
    Seq(feed.slice(0, thirds(0)), feed.slice(thirds(0), thirds(1)),
      feed.slice(thirds(1), feed.length)).foreach { b =>
      input.addData(b.toSeq); q.processAllAvailable()
    }

    val streamed: Map[(String, String), Long] =
      spark.table("cmsparity").as[KeyOutput[Array[Byte]]]
        .collect().groupBy(_.key).toSeq
        .flatMap { case (src, rows) =>
          val c = CountMinSketch.readFrom(
            new ByteArrayInputStream(rows.maxBy(_.offset).state.get))
          probes.map(t => (src, t) -> c.estimateCount(t.getBytes("UTF-8")))
        }.toMap
    q.stop()

    val ok = streamed == batch
    if (!ok) {
      (streamed.keySet ++ batch.keySet).toSeq.sorted
        .filter(k => streamed.get(k) != batch.get(k)).take(8).foreach { k =>
          println(s"MISMATCH $k stream=${streamed.get(k)} batch=${batch.get(k)}")
        }
    }
    spark.stop()
    println(s"CMS_PARITY_OK=$ok (${batch.size} probe cells)")
    sys.exit(if (ok) 0 else 1)
  }
}
