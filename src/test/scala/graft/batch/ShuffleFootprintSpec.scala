package graft.batch

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Runtime shuffle-footprint proofs: the plan audits pin SHAPES; this
  * spec pins BYTES. For the operators whose 100 TB story is "the wide
  * text never shuffles", the measured shuffle write over a ~10 MB
  * synthetic corpus must stay a small fraction of the corpus — a
  * regression that keeps the plan shape but starts shipping text rows (a
  * dropped projection, a lost broadcast) fails here even though the plan
  * string still looks right. (The sf0.01 tables are too small for this:
  * their result tables are the same order as the corpus, so ratios have
  * no power — hence the synthetic corpus.)
  */
class ShuffleFootprintSpec extends SparkTestBase {

  /** 2000 docs x ~5 KB of noise text, ~10 MB total, 8 partitions. */
  private lazy val corpus = {
    import spark.implicits._
    val df = (0 until 2000).map { i =>
      (i.toLong, noiseText(5000, seed = 0x9e3779b97f4a7c15L ^ i, from = 'a', span = 26))
    }.toDF("doc_id", "text").repartition(8)
    df.localCheckpoint(true)
  }
  private val corpusBytes = 2000L * 5000

  /** Run `action` and return shuffle bytes written across its stages.
    * Listener events are async — poll until stable for 500 ms. */
  private def shuffleBytes(action: => Unit): Long = {
    @volatile var shuffle = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffle += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var last = -1L
      var stableSince = System.nanoTime()
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
        (System.nanoTime() - stableSince) < 500L * 1000 * 1000) {
        if (shuffle != last) { last = shuffle; stableSince = System.nanoTime() }
        Thread.sleep(50)
      }
      shuffle
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("doc profile: 10 MB of text reduces to signal rows map-side; " +
    "the exchange carries < 5% of the corpus") {
    val c = corpus // force the (shuffling) corpus build OUTSIDE the listener
    val sw = shuffleBytes {
      graft.operators.TextAnalysis.profile(c, "doc_id", "text")
        .orderBy("doc_id").collect()
      ()
    }
    assert(sw < corpusBytes / 20,
      s"profile shuffled $sw of $corpusBytes corpus bytes — text is leaking into the exchange")
  }

  test("exact dedup: keep-min exchanges digest keys only (< 5% of corpus)") {
    val sw = shuffleBytes {
      graft.operators.Dedup.exact(corpus, "doc_id", "text").collect()
      ()
    }
    assert(sw < corpusBytes / 20,
      s"dedup shuffled $sw of $corpusBytes corpus bytes — keep-min must ship digests, not text")
  }

  test("brute-force ANN: the shuffle is DIMENSION-INDEPENDENT — scoring rows " +
    "move, 6 MB of vectors never do (< 12% of vector bytes)") {
    import spark.implicits._
    // 1500 x 1024-dim float vectors (~6 MB) + 5 query vectors: the ranking
    // exchange carries (qid, cand_id, sim) rows (~7.5k slim rows), so its
    // bytes are set by corpus COUNT, not vector WIDTH — the property that
    // makes the broadcast BNLJ shape survive embedding-dimension growth
    val baseVecs = (0 until 1500).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      (i.toLong, Array.fill(1024)(r.nextFloat() * 2 - 1))
    }
    val vecs = baseVecs.toDF("id", "vec").repartition(8).localCheckpoint(true)
    val queries = baseVecs.take(5).map { case (i, v) => (90000L + i, v) }
      .toDF("id", "vec")
    val vecBytes = 1500L * 1024 * 4
    val sw = shuffleBytes {
      graft.operators.Similarity
        .bruteForceTopK(vecs, queries, "id", "vec", k = 10).collect()
      ()
    }
    assert(sw < vecBytes / 8,
      s"brute-force ANN shuffled $sw of $vecBytes vector bytes — vectors are leaking into the ranking exchange")
  }

  test("decontamination: train text never shuffles (eval grams broadcast; < 5% of corpus)") {
    import spark.implicits._
    val eval = (0 until 20).map { i =>
      (100000L + i, noiseText(2000, seed = 0x51ed270b9f8f41c3L ^ i, from = 'a', span = 26))
    }.toDF("doc_id", "text")
    val sw = shuffleBytes {
      graft.operators.Corpus.contamination(corpus, eval, "doc_id", "text", 8).collect()
      ()
    }
    assert(sw < corpusBytes / 20,
      s"contamination shuffled $sw of $corpusBytes corpus bytes — the broadcast design regressed")
  }
}
