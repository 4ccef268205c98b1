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

  /** Word-type count under the trainer's pretokenizer — the number the
    * driver cap is compared against (sizing probe for callers picking a
    * `maxVocabRows`). */
  def wordTypes(docs: DataFrame, textCol: String): Long =
    docs.select(explode(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("w"))
      .agg(count_distinct(col("w"))).collect()(0).getLong(0)

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
      } else distributedMergeLoop(vocab0, numMerges, maxVocabRows)
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
  private def driverMergeLoop(words: Array[(Array[String], Long)], numMerges: Int,
      rankStart: Int = 1): Seq[(Int, String, String, String, Long)] = {
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
    var rank = rankStart
    while (rank < rankStart + numMerges && !tree.isEmpty) {
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

  /** Per-round collected window for the batched fallback: the top-M pairs
    * by (count desc, pair asc) with their created-pair bounds — a bounded
    * driver gather (M rows of two short strings + two longs), and the
    * ceiling on how many merges one round can emit. */
  val BatchWindow = 256

  /** Rounds (= Spark count-jobs) the last [[distributedMergeLoop]] run
    * took — the merges-per-job measurement hook for the scale harness.
    * Driver-side only, set at loop exit; not thread-safe by design (the
    * trainer is a driver-side orchestration, not a task-side kernel). */
  @volatile var lastDistributedRounds: Int = 0

  /** Total driver ACTIONS (counting jobs + shrink checks) of the last
    * [[distributedMergeLoop]] run — the honest denominator for the
    * merges-per-job measurement. */
  @volatile var lastDistributedActions: Int = 0

  /** Driver-side stop-reason tracing for the batched fallback (stderr). */
  private def debug: Boolean = sys.env.get("GRAFT_BPE_DEBUG").contains("1")

  /** Above-cap route: BATCHED merge rounds. One Spark counting job per
    * round emits up to [[BatchWindow]] merges, provably identical to the
    * one-merge-at-a-time greedy sequence (which is what the driver loop
    * runs and BpeTrainerSpec pins). Per round:
    *
    *   1. ONE action computes, over the current vocab, (a) every adjacent
    *      pair's count and (b) every pair's *created-pair bound* — the max
    *      count over the adjacent TRIPLES containing it (`x a b` / `a b y`,
    *      via the width-3 [[graft.functions.AdjacentJoin]]). Merging (a,b)
    *      can only create pairs involving the merged symbol m=a+b, and
    *      every occurrence of such a pair ((x,m), (m,y), or (m,m)) maps to
    *      a distinct pre-merge triple occurrence, so the bound dominates
    *      every pair the merge can create. Top-M rows collected.
    *   2. The driver accepts the longest PREFIX `p1..pk` of that
    *      (count desc, pair asc) order such that each accepted pair is
    *      symbol-disjoint from all earlier accepted ones (its {a, b} avoid
    *      every earlier {a_i, b_i, m_i}, and its m is not an earlier
    *      symbol either — two merges minting the SAME symbol would add
    *      their created counts) and its count STRICTLY exceeds every
    *      earlier accepted pair's created-pair bound. One more guard: if
    *      an accepted merge re-mints a symbol an EARLIER ROUND already
    *      created (driver-tracked mint set), pairs involving that symbol
    *      may pre-exist BELOW the window and grow by up to the triple
    *      bound — unboundable against later batch members — so such a
    *      merge is accepted but CLOSES its batch. Original symbols are
    *      single code points while every m is at least two, so a fresh m
    *      can only collide with a previous round's mint, never with the
    *      seed alphabet.
    *   3. The batch is applied youngest-rank-innermost as nested
    *      [[graft.functions.MergePair]] kernels in one projection — the
    *      exact sequential application order within each word.
    *
    * Why this equals the sequential greedy argmax sequence: at sequential
    * round i ≤ k, pairs untouched by merges 1..i-1 keep their counts and
    * are dominated by p_i (same order, same tie-break, and the batch is a
    * contiguous prefix so nothing between p_1 and p_i was skipped); pairs
    * sharing a symbol with an earlier merge only LOSE occurrences (a
    * non-created pair contains no m_j, so nothing can mint new occurrences
    * of it); and created pairs are capped by the bounds, each strictly
    * below c_i. The first rejection ends the batch — the next round
    * recounts from scratch, so nothing is assumed about rejected pairs.
    *
    * Batch sizes are corpus-dependent (contiguous low-context-overlap runs
    * of the count curve batch well; a steep head with concentrated
    * contexts batches as 1, which is the old per-merge behavior at the old
    * cost — measured 1.6-3 merges/counting-job on the synthetic corpora,
    * whose templated text is saturated with exact count ties).
    *
    * The second, usually dominant accelerator is SHRINK-THEN-RECOLLECT:
    * every round drops word types that merged to a single symbol, so an
    * above-cap corpus shrinks as its frequent head fully merges; the
    * moment the active set fits `maxVocabRows`, it is collected and the
    * exact [[driverMergeLoop]] finishes the remaining merges with zero
    * jobs per merge (rank-offset continuation — the in-memory loop is
    * state-based, so starting it from the partially-merged vocabulary is
    * the same sequential computation). Measured on the sf0.1 documents
    * corpus forced above-cap: see SCALING.md §BPE. */
  private def distributedMergeLoop(vocab0: DataFrame, numMerges: Int,
      maxVocabRows: Long = 0L): Seq[(Int, String, String, String, Long)] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    val minted = mutable.Set[String]()
    var rank = 1
    var rounds = 0
    var actions = 0
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // (a) pair counts and (b) triple-derived bounds in ONE aggregation:
      // union the pair candidates (c = n, bound = 0) with the pre-combined
      // triple windows re-keyed to their two sub-pairs (c = 0, bound = tc),
      // then one groupBy(pair) does sum(c) + max(bound). Symbols never
      // contain Sep, so substring_index recovers the sub-pairs exactly.
      val pairCand = vocab.select(
        explode(graft.functions.AdjacentJoin(col("sym"), Sep)).as("pair"),
        col("n").as("c"), lit(0L).as("tc"))
      val tripleCand = vocab.select(
          explode(graft.functions.AdjacentJoin(col("sym"), Sep, 3)).as("t"),
          col("n"))
        .groupBy("t").agg(sum(col("n")).as("tc"))
        .select(explode(array(
            substring_index(col("t"), Sep, 2),
            substring_index(col("t"), Sep, -2))).as("pair"),
          lit(0L).as("c"), col("tc"))
      val top = pairCand.union(tripleCand)
        .groupBy("pair").agg(sum(col("c")).as("c"), max(col("tc")).as("bound"))
        .orderBy(col("c").desc, col("pair"))
        .limit(BatchWindow)
        .collect()
      rounds += 1
      actions += 1
      if (top.isEmpty) exhausted = true
      else {
        val used = mutable.Set[String]()
        var maxBound = 0L
        val batch = mutable.ArrayBuffer[(String, String, Long)]()
        var open = true
        var i = 0
        while (open && i < top.length && rank + batch.size <= numMerges) {
          val Array(a, b) = top(i).getString(0).split(Sep, 2)
          val c = top(i).getLong(1)
          val bound = top(i).getLong(2)
          val m = a + b
          if (batch.isEmpty ||
              (!used(a) && !used(b) && !used(m) && c > maxBound)) {
            batch += ((a, b, c))
            used += a; used += b; used += m
            maxBound = math.max(maxBound, bound)
            i += 1
            // re-minting a symbol from an earlier round: pairs involving
            // it may pre-exist below the window and GROW — the triple
            // bound covers only created occurrences, so nothing after
            // this merge can be proven safe this round
            if (minted(m)) {
              open = false
              if (debug) System.err.println(s"[bpe] round stop: remint $m after ${batch.size}")
            }
          } else {
            open = false // prefix contiguity: stop, never skip
            if (debug) {
              val why =
                if (used(a) || used(b) || used(m)) s"conflict ($a,$b)"
                else s"bound c=$c <= maxBound=$maxBound at ($a,$b)"
              System.err.println(s"[bpe] round stop: $why after ${batch.size}")
            }
          }
        }
        batch.foreach { case (a, b, c) =>
          merges += ((rank, a, b, a + b, c)); rank += 1; minted += (a + b)
        }
        // youngest rank innermost: foldLeft nests rank order inside-out,
        // which IS the sequential per-word application order
        val applied = batch.foldLeft(col("sym")) { case (e, (a, b, _)) =>
          graft.functions.MergePair(e, a, b)
        }
        // fully-merged words (single symbol) contribute no pairs or
        // triples ever again — dropping them shrinks later rounds
        val next = vocab
          .select(applied.as("sym"), col("n"))
          .filter(size(col("sym")) > 1)
          .localCheckpoint(true)
        vocab.unpersist()
        vocab = next
        // shrink-then-recollect: fully-merged word types leave the active
        // set every round, so an above-cap corpus can FALL UNDER the cap
        // mid-training — from there the exact in-memory driver loop
        // finishes the remaining merges with zero jobs per merge. The
        // count is a cached-scan action on the just-checkpointed frame
        // (cheap, and honestly tallied in `actions`).
        if (rank <= numMerges && maxVocabRows > 0) {
          val active = vocab.count()
          actions += 1
          if (active <= maxVocabRows) {
            val words = vocab.collect().map { r =>
              (r.getSeq[String](0).toArray, r.getLong(1))
            }
            vocab.unpersist()
            merges ++= driverMergeLoop(words, numMerges - rank + 1, rank)
            lastDistributedRounds = rounds
            lastDistributedActions = actions
            return merges.result()
          }
        }
      }
    }
    vocab.unpersist()
    lastDistributedRounds = rounds
    lastDistributedActions = actions
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
