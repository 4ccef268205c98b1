package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Distributed BPE merge LEARNING (Sennrich, Haddow, Birch 2016) — the
  * training-side twin of `functions.BpeTokenCount`'s merge-applying
  * counter: learn the merge table itself from the corpus.
  *
  * Shape at 100 TB — the part that matters: the corpus is scanned ONCE,
  * into the word-frequency table (pretokenized by the same public regex
  * the counting kernels use; classic BPE trains on word types weighted by
  * frequency, not on the raw token stream). That histogram is
  * VOCABULARY-sized, not corpus-sized — a natural-language corpus tops
  * out at a few million word types regardless of corpus bytes — so the
  * merge rounds themselves need not be Spark jobs at all: below
  * `maxVocabRows` the histogram is collected once (an explicitly bounded
  * driver gather, the IVF-centroid discipline) and the classic indexed
  * in-memory merge loop runs driver-side — incremental pair counts, a
  * (count desc, pair asc) ordered set for the argmax, only words
  * containing the merged pair touched per round. 50 000 merges run in
  * seconds with ZERO scheduler round-trips, where the one-Spark-job-per-
  * merge loop would pay hours of pure scheduling latency independent of
  * cluster size. Above the cap the distributed round loop still runs:
  * pair counting is an explode + map-side-combined sum over `vocab` rows,
  * the argmax a 1-row bounded top-k collect, the rewrite a codegen'd
  * kernel projection (`functions.MergePair` — greedy left-to-right,
  * boundary-correct on symbol ARRAYS), each round rebasing lineage with
  * an eager localCheckpoint (the `connectedComponents` discipline; swap
  * for `checkpoint()` on a cluster). Both routes are bit-identical —
  * BpeTrainerSpec pins driver-vs-distributed equality at 200+ merges and
  * both against an independent reference trainer.
  *
  * Determinism: pair counts are integers; ties break on the pair string
  * (left + U+0001 + right) ascending in UTF-8 binary order — Spark's
  * string sort order — bit-stable across runs, engines, and routes.
  * Symbols never contain the U+0001 pair separator: multi-char words
  * come from `[a-z]+|[0-9]+` and other characters tokenize as
  * single-symbol words (no pairs).
  *
  * Returns (rank, left, right, merged, pair_count): `numMerges` rows (or
  * fewer if the vocabulary runs out of adjacent pairs). */
object BpeTrainer {

  val Sep = "\u0001"

  /** Default driver-gather cap. The honest footprint is NOT the parquet
    * row size: each collected word type becomes an Array of single-char
    * Strings (~50 B per char-String + refs ≈ 0.5 KB for a 8-char word)
    * and the merge loop's pair→word-ids index adds boxed-Int set entries
    * per (pair, containing word) — ~1-2 KB per word type end to end. 1M
    * types ≈ 1-2 GB driver heap: safe on any reasonably-sized driver,
    * while still above the ~1M-type plateau of regex-pretokenized
    * natural-language corpora. Corpora richer than that take the
    * distributed round loop (correct at any size, slower per merge) or an
    * explicit higher cap from a caller who sized their driver. */
  val DefaultMaxVocabRows = 1000000L

  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      maxVocabRows: Long = DefaultMaxVocabRows): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    val vocab0 = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(split(col("w"), "").as("sym"), col("n"))
      .localCheckpoint(true) // the ONLY corpus-sized step
    val nTypes = vocab0.count()
    val merges =
      if (nTypes <= maxVocabRows) {
        val words = vocab0.collect().map { r =>
          (r.getSeq[String](0).toArray, r.getLong(1))
        }
        vocab0.unpersist()
        driverMergeLoop(words, numMerges)
      } else distributedMergeLoop(vocab0, numMerges)
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.map(Row.fromTuple), 1), schema)
  }

  /** UTF-8 binary string order — Spark's `orderBy` on strings, which
    * disagrees with Java's UTF-16 order for supplementary vs
    * U+E000..U+FFFF code points. */
  private def utf8Compare(x: String, y: String): Int = {
    val xb = x.getBytes("UTF-8"); val yb = y.getBytes("UTF-8")
    var i = 0
    while (i < xb.length && i < yb.length) {
      val d = (xb(i) & 0xff) - (yb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    xb.length - yb.length
  }

  /** Greedy left-to-right non-overlapping merge — the scalar twin of the
    * `functions.MergePair` codegen kernel (bit-identical by the spec's
    * kernel truth table). */
  private def mergeGreedy(s: Array[String], a: String, b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** The classic indexed in-memory BPE trainer: incremental pair counts,
    * a TreeSet ordered (count desc, joined-pair UTF-8 asc) for O(log P)
    * argmax, a lazy pair→word-ids index so each round touches only words
    * containing the winning pair. Exactly the distributed loop's
    * semantics — per-round full recount of each TOUCHED word's pairs
    * keeps the greedy-overlap arithmetic trivially correct. */
  private def driverMergeLoop(words: Array[(Array[String], Long)], numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val syms = words.map(_._1)
    val freq = words.map(_._2)
    val counts = mutable.HashMap[String, Long]()
    val where = mutable.HashMap[String, mutable.Set[Int]]()
    val ord = new java.util.Comparator[(Long, String)] {
      def compare(x: (Long, String), y: (Long, String)): Int = {
        val byCount = java.lang.Long.compare(y._1, x._1) // count desc
        if (byCount != 0) byCount else utf8Compare(x._2, y._2) // pair asc
      }
    }
    val tree = new java.util.TreeSet[(Long, String)](ord)
    def bump(k: String, delta: Long): Unit = {
      val old = counts.getOrElse(k, 0L)
      if (old > 0) tree.remove((old, k))
      val next = old + delta
      if (next > 0) { counts(k) = next; tree.add((next, k)) }
      else counts.remove(k)
    }
    def touchPairs(wi: Int, sign: Long): Unit = {
      val s = syms(wi); val n = freq(wi); var i = 0
      while (i < s.length - 1) {
        val k = s(i) + Sep + s(i + 1)
        bump(k, sign * n)
        if (sign > 0) where.getOrElseUpdate(k, mutable.Set[Int]()).add(wi)
        i += 1
      }
    }
    def containsPair(s: Array[String], a: String, b: String): Boolean = {
      var i = 0
      while (i < s.length - 1) {
        if (s(i) == a && s(i + 1) == b) return true
        i += 1
      }
      false
    }
    var wi = 0
    while (wi < syms.length) { touchPairs(wi, 1L); wi += 1 }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    while (rank <= numMerges && !tree.isEmpty) {
      val (c, k) = tree.first()
      val Array(a, b) = k.split(Sep, 2)
      out += ((rank, a, b, a + b, c))
      // stale ids (words rewritten since they last contained k) filter out
      val touched = where.remove(k).getOrElse(mutable.Set.empty)
      touched.foreach { w =>
        if (containsPair(syms(w), a, b)) {
          touchPairs(w, -1L)
          syms(w) = mergeGreedy(syms(w), a, b)
          touchPairs(w, 1L)
        }
      }
      rank += 1
    }
    out.result()
  }

  /** Above-cap route: one Spark round per merge (pair explode + combine,
    * 1-row argmax collect, kernel rewrite projection). Correct at any
    * vocabulary size; pays ~0.1 s scheduler latency per merge, so it is
    * the fallback, not the default. */
  private def distributedMergeLoop(vocab0: DataFrame, numMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = vocab
        .select(explode(graft.functions.AdjacentJoin(col("sym"), Sep)).as("pair"),
          col("n"))
        .groupBy("pair").agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top(0).getString(0).split(Sep, 2)
        merges += ((rank, a, b, a + b, top(0).getLong(1)))
        val next = vocab
          .select(graft.functions.MergePair(col("sym"), a, b).as("sym"), col("n"))
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    merges.result()
  }

  /** Collect a learned merge frame into a runtime [[graft.functions.BpeMergeTable]]
    * for the `BpeEncode` kernel — the learn→encode handoff. The frame is
    * numMerges rows (bounded, driver-sized by design: it IS the tokenizer
    * artifact a real pipeline persists), so this collect is the k-row
    * gather the IVF centroid load established, not a corpus collect. */
  def tableOf(merges: DataFrame): graft.functions.BpeMergeTable = {
    val rows = merges.select("rank", "left", "right")
      .collect().sortBy(_.getInt(0))
    graft.functions.BpeMergeTable(
      rows.toSeq.map(r => (r.getString(1), r.getString(2))))
  }
}
