package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.model.Record
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import graft.operators.Lineage.LineageOps

/** Stream↔batch parity for INCREMENTAL DECONTAMINATION
  * ([[graft.operators.Dedup.exactAgainst]]) — the web-crawl shape: a new
  * batch dedups within itself (keep the minimum id per content key) and
  * against everything already ingested. The one ingest-shaped dedup op
  * that had no streaming twin (exact-hash incremental and MinHash
  * near-dup both have one).
  *
  * Batch truth: `exactAgainst` folded over three successive batches of
  * the real sf0.001 documents corpus (augmented with re-crawls so
  * cross-batch duplicates exist), the seen-key set accumulating batch by
  * batch from an initial "yesterday's index" seed (every 5th doc).
  *
  * Streaming: the same batches replayed through [[KeyFlowTws]] keyed by
  * content digest, WITH an at-least-once replay overlap. The seed index
  * arrives as a batch-0 feed of marker records (id −1), and the fold is
  * first-writer-wins: the first record a key ever folds IS its kept doc
  * (records are fed id-ascending within each batch, so first == the
  * batch minimum — exactAgainst's keep rule), and every later occurrence
  * is a suppressed duplicate. Kept set = final states ≥ 0.
  *
  * Exits 0 iff the streaming kept map (digest → kept id) equals the
  * accumulated batch outputs exactly. Forked by StreamBatchParitySpec
  * (the Spark 4.1 stateful-exec-under-sbt constraint, see TimerSmoke).
  */
object ExactAgainstParitySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // corpus: originals + re-crawls of every 3rd doc under a high id (the
    // same digest lands in a LATER batch, so the cross-batch suppression
    // leg is really exercised)
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val recrawls = base.filter(_._1 % 3 == 0).map { case (id, d) => (id + 1000000L, d) }
    // yesterday's index: every 5th doc's digest is already ingested
    val seenSeed = base.filter(_._1 % 5 == 0).map(_._2).distinct.toSeq
    val stream = (base ++ recrawls).sortBy(_._1)
    val thirds = (1 to 2).map(i => stream.length * i / 3)
    val batches = Seq(
      stream.slice(0, thirds(0)), stream.slice(thirds(0), thirds(1)),
      stream.slice(thirds(1), stream.length))

    // ---- batch truth: exactAgainst per batch, seen set accumulating
    var seenDf = seenSeed.toDF("digest")
    val kept = scala.collection.mutable.Map[String, Long]()
    batches.foreach { b =>
      val bDf = b.toSeq.toDF("doc_id", "digest")
      Dedup.exactAgainst(bDf, seenDf, "doc_id", "digest")
        .select("digest", "doc_id")
        .collect().foreach(r => kept(r.getString(0)) = r.getLong(1))
      seenDf = seenDf.union(bDf.select("digest")).distinct().lineageCut()
    }

    // ---- streaming: first-writer-wins fold keyed by digest
    val fold = FoldOption.of[Long, Record] { r =>
      new String(r.value, "UTF-8").toLong
    } { (st, _) => st }

    def rec(offset: Long, digest: String, docId: Long): Record =
      Record("documents", 0, offset, new Timestamp(0L), 0, digest,
        docId.toString.getBytes("UTF-8"), Map.empty)
    // offsets: a global ascending sequence (seed first, then batches in
    // feed order — id-ascending within each batch)
    var off = 0L
    def feedOf(xs: Seq[(Long, String)]): Seq[Record] =
      xs.map { case (id, d) => off += 1; rec(off, d, id) }
    val seedFeed = seenSeed.map { d => off += 1; rec(off, d, -1L) }
    val batchFeeds = batches.map(b => feedOf(b))

    val input = MemoryStream[Record]
    val q = KeyFlowTws.flow(input.toDS(), fold)
      .writeStream.format("memory").queryName("decontparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("decontparity").toString)
      .start()
    input.addData(seedFeed); q.processAllAvailable()
    batchFeeds.zipWithIndex.foreach { case (b, i) =>
      // at-least-once: every batch after the first re-sends the previous
      // batch's tail
      val replay = if (i == 0) Seq.empty else batchFeeds(i - 1).takeRight(15)
      input.addData(replay ++ b); q.processAllAvailable()
    }

    val streamed: Map[String, Long] =
      spark.table("decontparity").as[KeyOutput[Long]].collect()
        .groupBy(_.key)
        .map { case (k, rows) => k -> rows.maxBy(_.offset).state.get }
        .filter(_._2 >= 0L) // seeded keys were never "kept"
    q.stop()

    val ok = streamed == kept.toMap
    if (!ok) {
      val keys = (streamed.keySet ++ kept.keySet).toSeq.sorted
      keys.filter(k => streamed.get(k) != kept.get(k)).take(5).foreach { k =>
        println(s"MISMATCH digest=$k stream=${streamed.get(k)} batch=${kept.get(k)}")
      }
      println(s"kept stream=${streamed.size} batch=${kept.size}")
    }
    spark.stop()
    println(s"EXACT_AGAINST_PARITY_OK=$ok (${kept.size} kept, " +
      s"${seenSeed.size} seeded, ${stream.size} fed)")
    sys.exit(if (ok) 0 else 1)
  }
}
