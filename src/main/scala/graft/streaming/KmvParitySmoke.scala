package graft.streaming

import graft.Tables
import graft.fold.FoldOption
import graft.functions.{KmvBuffer, KmvJaccardPpm, KmvSketch}
import graft.model.Record
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}
import java.sql.Timestamp

/** Stream↔batch parity for an INCREMENTALLY MAINTAINED KMV distinct
  * sketch: per-source bottom-k hash sets kept as per-key state through
  * the stateful surface must equal the batch `kmv_sketch` aggregate
  * HASH FOR HASH — and therefore every downstream overlap estimate the
  * declared `q_kmv_overlap` derives agrees too (one grid cell re-checked
  * through the same reader expression).
  *
  * Why it must hold: the KMV merge (k unsigned-smallest of a union) is
  * associative, commutative AND idempotent — so unlike the CMS twin this
  * state is replay-safe by construction; the smoke still feeds a replay
  * overlap to document exactly that distinction. Records carry the
  * token hashes (packed longs), since the subject is incremental sketch
  * maintenance, not the hash function.
  *
  * Exits 0 iff every source's sketch matches and the sampled Jaccard
  * cell agrees. Forked by StreamBatchParitySpec (Spark 4.1 stateful exec
  * NPEs under sbt test).
  */
object KmvParitySmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val K = 128
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // ---- batch truth: the q_kmv_overlap building block
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("token"))
      .filter(length(col("token")) >= 3)
    val batch: Map[String, Seq[Long]] = tok
      .groupBy("source")
      .agg(KmvSketch(xxhash64(col("token")), K).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    // ---- streaming: one Record per doc keyed by source, value = that
    // doc's token hashes as packed longs (hashes computed by the same
    // xxhash64 expression the batch path uses)
    val docs = tok
      .groupBy("source", "doc_id")
      .agg(collect_list(xxhash64(col("token"))).as("hs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(_._2)
    val feed = docs.zipWithIndex.map { case ((src, _, hs), seq) =>
      val bb = ByteBuffer.allocate(8 * hs.length).order(ByteOrder.LITTLE_ENDIAN)
      hs.foreach(bb.putLong)
      Record("docs", 0, seq.toLong, new Timestamp(0L), 0, src,
        bb.array(), Map.empty)
    }

    def mergeDoc(st: Array[Long], r: Record): Array[Long] = {
      val buf = new KmvBuffer(K)
      st.foreach(buf.add)
      val bb = ByteBuffer.wrap(r.value).order(ByteOrder.LITTLE_ENDIAN)
      while (bb.remaining() >= 8) buf.add(bb.getLong)
      val out = new Array[Long](buf.set.size)
      val it = buf.set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
    val fold = FoldOption.of[Array[Long], Record](
      r => mergeDoc(Array.empty, r))(mergeDoc)

    val input = MemoryStream[Record]
    val out = KeyFlowTws.flow(input.toDS(), fold)
    val q = out.writeStream.format("memory").queryName("kmvparity")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kmvparity").toString)
      .start()
    // 3 microbatches WITH a replay overlap — the KMV merge is idempotent,
    // so re-delivery is harmless even before the offset guard
    val thirds = Seq(feed.length / 3, feed.length * 2 / 3)
    val b1 = feed.slice(0, thirds(0))
    val b2 = b1.takeRight(5) ++ feed.slice(thirds(0), thirds(1))
    val b3 = feed.slice(thirds(1), feed.length)
    Seq(b1, b2, b3).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }

    val streamed: Map[String, Seq[Long]] =
      spark.table("kmvparity").as[KeyOutput[Array[Long]]]
        .collect().groupBy(_.key).toSeq
        .map { case (src, rows) => src -> rows.maxBy(_.offset).state.get.toSeq }
        .toMap
    q.stop()

    val sketchOk = streamed == batch
    // one overlap cell through the declared reader expression, from the
    // STREAMED sketches vs the BATCH sketches
    val srcs = batch.keySet.toSeq.sorted.take(2)
    def jac(m: Map[String, Seq[Long]]): Long = {
      val t = org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, false)
      KmvJaccardPpm(
        org.apache.spark.sql.catalyst.expressions.Literal.create(m(srcs(0)).toArray, t),
        org.apache.spark.sql.catalyst.expressions.Literal.create(m(srcs(1)).toArray, t),
        K).eval(null).asInstanceOf[Long]
    }
    val cellOk = srcs.length < 2 || jac(streamed) == jac(batch)

    if (!sketchOk) {
      (streamed.keySet ++ batch.keySet).toSeq.sorted
        .filter(k => streamed.get(k) != batch.get(k)).take(3).foreach { k =>
          println(s"MISMATCH src=$k stream=${streamed.get(k).map(_.take(5))} " +
            s"batch=${batch.get(k).map(_.take(5))}")
        }
    }
    spark.stop()
    val ok = sketchOk && cellOk
    println(s"KMV_PARITY_OK=$ok (${batch.size} sources, cell=$cellOk)")
    sys.exit(if (ok) 0 else 1)
  }
}
