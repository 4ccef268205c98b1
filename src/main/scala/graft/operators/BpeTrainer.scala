package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable
import graft.operators.Lineage.LineageOps

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
      .lineageCut() // the ONLY corpus-sized step
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

  /** Speculation depth per round: how many merges one counting job tries
    * to confirm. Bounded driver work (the verify walk is over the
    * collected window) and bounded kernel work (each word replays at most
    * this many merges per scan). */
  val SpecDepth = 48

  /** Per-round collected rows: all delta rows (sorted first) plus the top
    * of the base pair/triple table — a bounded driver gather; the last
    * collected base count is the completeness horizon below which nothing
    * is assumed. */
  val CollectLimit = 160000

  /** Test seam: BpeTrainerSpec shrinks the collected window to force the
    * CUT-window verification paths (horizon guards, conservative
    * unknown-base bounds, zero-confirm fallback) that the production
    * limit never exercises at spec scale — equality with the sequential
    * reference must hold under ANY window size, because the guards stop
    * confirmation rather than approximate. Production code never sets it. */
  @volatile private[graft] var collectLimitForTests: Int = CollectLimit

  /** Rewrite the stored vocabulary once this many confirmed merges are
    * pending (the kernel replays pending merges per scan until then, so
    * rewriting rarely keeps rounds at ~1 action each). */
  val RewritePendingCap = 64

  /** Above-cap route: SPECULATE-VERIFY merge rounds — optimistic
    * execution with exact verification, so the learned sequence is
    * provably the one-merge-at-a-time greedy sequence (what
    * [[driverMergeLoop]] runs and BpeTrainerSpec pins against an
    * independent reference) while one Spark job confirms MANY merges.
    *
    * Per round, ONE counting job evaluates [[graft.functions.BpeSpeculate]]
    * over every word: it applies the already-confirmed-but-unwritten
    * `pending` merges, emits the exact step-0 pair/triple bag of the
    * current state, then replays up to [[SpecDepth]] SPECULATED merges
    * (the driver's heuristic guess), emitting the exact pair-count delta
    * after each step. The aggregation of those rows gives the driver the
    * exact global count table after EVERY speculated prefix. The driver
    * then verifies: walking steps in order, the true greedy argmax
    * (count desc, then pair-string asc in UTF-8 order — Spark's string
    * sort) must equal the speculated merge; the walk stops at the first
    * mismatch (the true argmax is then KNOWN exactly and seeds the next
    * round's speculation, so every round makes progress) or at the first
    * unprovable comparison:
    *
    *   - the candidate argmax count must strictly exceed the collection
    *     horizon (pairs below the collected window could tie otherwise);
    *   - a delta-touched pair that was NOT in the base window has unknown
    *     base count unless one of its symbols was minted by a confirmed
    *     step of THIS round and never minted before (then base = 0 — a
    *     pair over a nonexistent symbol cannot pre-exist; original symbols
    *     are single code points, every mint is at least two, so only a
    *     re-mint of a previous round's symbol is ambiguous). Such unknown-
    *     base pairs carry a conservative upper bound (horizon + positive
    *     deltas) and stop the walk if that bound could beat or tie-beat
    *     the candidate.
    *
    * Mis-speculation costs nothing: deltas beyond the confirmed prefix
    * are discarded and the stored vocabulary is only ever rewritten with
    * CONFIRMED merges (same greedy kernel, youngest rank innermost), so
    * no rollback is needed — each round re-derives the base table from
    * the actual data, and a speculation bug can only reduce throughput,
    * never change results.
    *
    * Speculation quality: the driver simulates greedy from the verified
    * end-state using the collected pair window plus the base TRIPLE
    * window (merging (a,b) destroys (x,a) by the (x,a,b) triple count and
    * creates (x, ab); symmetrically on the right), which predicts the
    * true order well until counts approach the horizon. If two
    * consecutive rounds confirm nothing (degenerate windows — e.g. every
    * count equal at the horizon), a plain exact top-1 round guarantees
    * progress; an EMPTY speculation list escalates to that fallback
    * immediately (an unspeculated round can never confirm, so waiting for
    * it would loop the identical counting job forever on flat-count
    * corpora).
    *
    * The second accelerator is SHRINK-THEN-RECOLLECT: every rewrite drops
    * word types that merged to a single symbol, so an above-cap corpus
    * shrinks as its frequent head fully merges; the moment the active set
    * fits `maxVocabRows`, it is collected and the exact [[driverMergeLoop]]
    * finishes the remaining merges with zero jobs per merge (rank-offset
    * continuation). Measured merges/job: see SCALING.md §BPE. */
  private def distributedMergeLoop(vocab0: DataFrame, numMerges: Int,
      maxVocabRows: Long = 0L): Seq[(Int, String, String, String, Long)] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    val mintedEver = mutable.Set[String]()
    val pending = mutable.ArrayBuffer[(String, String)]()
    var spec: Seq[(String, String)] = Nil
    var rank = 1
    var rounds = 0
    var overflowRounds = 0
    var actions = 0
    var zeroStreak = 0
    var exhausted = false

    // apply `ms` in rank order via nested greedy kernels, drop fully
    // merged words, materialize. The grouped(16) chunking keeps each
    // AUTHORED Project small, but it does NOT bound the executed plan's
    // nesting: Catalyst's CollapseProject merges adjacent Projects whose
    // aliases are referenced once, so at RewritePendingCap=64 the
    // optimized plan nests all 64 MergePair calls in one collapsed
    // projection. That is fine by construction — MergePair is a codegen'd
    // unary kernel and Janino method-size pressure is handled by
    // codegen's splitExpressions — so no barrier is inserted; the
    // chunking survives only as cheap authoring hygiene.
    def rewrite(ms: Seq[(String, String)]): Unit = {
      if (ms.isEmpty) return
      val next0 = ms.grouped(16).foldLeft(vocab) { (d, chunk) =>
        d.select(chunk.foldLeft(col("sym")) { case (e, (a, b)) =>
          graft.functions.MergePair(e, a, b)
        }.as("sym"), col("n"))
      }
      val next = next0.filter(size(col("sym")) > 1).lineageCut()
      actions += 1
      vocab.unpersist()
      vocab = next
    }

    // hard round budget (the house termination-bound rule, applied to this
    // loop after it produced TWO non-termination bugs — r11 ADVICE's
    // flat-count streak reset, and the r12 overflow/base-only cycle the
    // patience fix reopened): the worst legitimate NON-overflow schedule
    // pays at most ~4 counting rounds per merge (bootstrap + base-only +
    // fallback's pair of jobs) plus bootstrap slack, so exceeding 4x the
    // merge budget is a bug and must fail LOUDLY instead of re-running
    // counting jobs forever. Delta-OVERFLOW rounds are counted SEPARATELY
    // and excluded from the budget (r12 ADVICE): a pathological corpus
    // whose simulate() persistently derives overflowing specs is making
    // legitimate progress through a sustained overflow -> base-only ->
    // confirm schedule (~6 rounds/merge) and must not trip the "this is a
    // bug" error. Overflow rounds cannot loop unboundedly on their own:
    // each increments the zero-confirm streak and resets spec, so two
    // consecutive speculated non-progress rounds always escalate to the
    // guaranteed-progress exact fallback — overflowRounds is bounded by
    // the counted rounds + 1 (an overflow is always followed by a counted
    // base-only round), keeping total rounds <= 2*budget + 1.
    val maxRounds = 4 * numMerges + 16
    while (rank <= numMerges && !exhausted) {
      if (rounds - overflowRounds >= maxRounds)
        throw new IllegalStateException(
          s"graft.BpeTrainer: ${rounds - overflowRounds} non-overflow " +
            s"counting rounds (+$overflowRounds overflow retries) for " +
            s"${rank - 1} confirmed merges (budget $maxRounds for " +
            s"$numMerges) — the speculate-verify loop is not progressing; " +
            "this is a bug in the streak/fallback guards, not a data problem")
      val depth = math.min(SpecDepth, numMerges - rank + 1)
      val specNow = spec.take(depth)
      val rows = vocab
        .select(explode(graft.functions.BpeSpeculate(
          col("sym"), col("n"), pending.toSeq, specNow, emitTriples = true)).as("e"))
        .select(col("e.step").as("step"), col("e.key").as("key"), col("e.v").as("v"))
        .groupBy("step", "key").agg(sum(col("v")).as("v"))
        // deltas first (they must be complete), then the base table by
        // count: the limit auto-tops the base and the tail row defines
        // the horizon
        .orderBy(when(col("step") > 0, 0).otherwise(1), col("v").desc, col("key"))
        .limit(collectLimitForTests)
        .collect()
      rounds += 1
      actions += 1

      val (deltaRows, baseRows) = rows.partition(_.getInt(0) > 0)
      if (deltaRows.nonEmpty && baseRows.isEmpty) {
        // delta overflow crowded out the base table entirely: retry the
        // round unspeculated (base-only; cannot recurse — no deltas).
        // An overflow IS a speculated zero-confirm round and must count
        // toward the fallback streak: the retry's base-only state feeds
        // simulate() the same inputs, so it re-derives the SAME
        // overflowing spec — without the streak the cycle
        // overflow -> base-only -> identical spec -> overflow never
        // terminates (the bootstrap-rounds-don't-count patience rule
        // alone reopened exactly that loop; caught by BpeTrainerSpec's
        // cut-window suite hanging).
        zeroStreak += 1
        overflowRounds += 1
        spec = Nil
        if (debug) System.err.println(s"[bpe] round $rounds: delta overflow, retrying base-only")
      } else if (baseRows.isEmpty) {
        // no pairs at all: flush pending and stop
        exhausted = true
      } else {
        val cut = rows.length == collectLimitForTests
        val horizon = if (cut) baseRows.last.getLong(2) else 0L
        val basePairs = mutable.LinkedHashMap[String, Long]()
        val baseTriples = mutable.HashMap[String, Long]()
        baseRows.foreach { r =>
          val k = r.getString(1)
          var seps = 0
          var i = 0
          while (i < k.length) { if (k.charAt(i) == Sep.charAt(0)) seps += 1; i += 1 }
          if (seps == 1) basePairs(k) = r.getLong(2) else baseTriples(k) = r.getLong(2)
        }
        val deltasByStep = deltaRows.groupBy(_.getInt(0))
          .map { case (s, rs) => s -> rs.map(r => (r.getString(1), r.getLong(2))) }

        // ---- exact verification walk ----
        val exact = mutable.HashMap[String, Long]() ++= basePairs
        val cons = mutable.HashMap[String, Long]() // unknown-base upper bounds
        val fresh = mutable.Set[String]()
        val confirmed = mutable.ArrayBuffer[(String, String, Long)]()
        var knownNext: Option[(String, String)] = None
        var walking = specNow.nonEmpty
        var k = 1
        while (walking && k <= specNow.length) {
          // argmax over exact counts (count desc, key UTF-8 asc)
          var amKey: String = null
          var amC = Long.MinValue
          exact.foreach { case (key, c) =>
            if (c > amC || (c == amC && amKey != null && utf8Compare(key, amKey) < 0)) {
              amKey = key; amC = c
            }
          }
          val consThreat = amKey == null || cons.exists { case (ck, cu) =>
            cu > amC || (cu == amC && utf8Compare(ck, amKey) < 0)
          }
          if (amKey == null || amC <= horizon || consThreat) {
            walking = false
            if (debug) System.err.println(
              s"[bpe] verify stop at step $k: horizon/conservative guard (amC=$amC horizon=$horizon)")
          } else {
            val Array(a, b) = amKey.split(Sep, 2)
            if ((a, b) != specNow(k - 1)) {
              knownNext = Some((a, b))
              walking = false
              if (debug) System.err.println(
                s"[bpe] mis-speculation at step $k: true argmax ($a,$b) != ${specNow(k - 1)}")
            } else {
              confirmed += ((a, b, amC))
              val m = a + b
              if (!mintedEver(m)) fresh += m
              deltasByStep.getOrElse(k, Array.empty).foreach { case (dk, dv) =>
                val si = dk.indexOf(Sep)
                if (dk.indexOf(Sep, si + 1) >= 0) {
                  // triple delta: keeps the SIM's triple view current
                  // through the confirmed prefix (no role in verification)
                  baseTriples(dk) = baseTriples.getOrElse(dk, 0L) + dv
                } else if (exact.contains(dk)) exact(dk) += dv
                else if (cons.contains(dk)) cons(dk) += dv
                else {
                  val l = dk.substring(0, si); val r = dk.substring(si + 1)
                  // an UNCUT window is the complete gram table, so an
                  // absent pair's base count is provably zero — exact,
                  // like a fresh-mint pair (a cut window leaves base in
                  // [0, horizon]: conservative upper bound)
                  if (fresh(l) || fresh(r) || !cut) exact(dk) = dv
                  else cons(dk) = horizon + dv
                }
              }
              k += 1
            }
          }
        }

        confirmed.foreach { case (a, b, c) =>
          merges += ((rank, a, b, a + b, c))
          pending += ((a, b))
          mintedEver += (a + b)
          rank += 1
        }
        if (debug) System.err.println(
          s"[bpe] round $rounds: confirmed ${confirmed.size}/${specNow.length} " +
            s"(pending ${pending.size}, horizon $horizon)")

        // Streak bookkeeping, by round kind:
        //  - speculated round, zero confirms  -> streak += 1
        //  - speculated round, any confirm    -> streak = 0
        //  - UNSPECULATED round (specNow empty: the bootstrap right after
        //    a fallback or a delta-overflow retry) -> streak UNCHANGED.
        //    It cannot confirm by construction, so counting it would
        //    halve the speculation patience after every fallback (pay a
        //    second exact job where one knownNext-seeded retry belongs);
        //    but RESETTING on it is the r11 non-termination (the streak
        //    never reached 2 on flat-count corpora). The termination
        //    guarantee instead lives below: a starved simulate() (empty
        //    spec, no known next) escalates straight to the exact
        //    fallback, so no state can loop the identical counting job.
        if (specNow.nonEmpty) {
          if (confirmed.isEmpty) zeroStreak += 1 else zeroStreak = 0
        }
        if (zeroStreak < 2 && rank <= numMerges) {
          // ---- next round's speculation: heuristic greedy simulation on
          // the verified end-state counts + (stale) base triples ----
          spec = simulate(exact, baseTriples, horizon, knownNext)
          // simulate() starved with no known-exact next merge: the coming
          // round is a guaranteed zero-confirm — escalate to the exact
          // fallback now instead of paying a counting job to learn that.
          if (spec.isEmpty) {
            zeroStreak = 2
            if (debug) System.err.println(
              s"[bpe] round $rounds: empty speculation (horizon $horizon), escalating to exact top-1")
          }
        }
        if (zeroStreak >= 2 && rank <= numMerges) {
          // degenerate window (e.g. everything ties at the horizon): one
          // plain exact top-1 merge guarantees progress
          rewrite(pending.toSeq); pending.clear()
          val top = vocab
            .select(explode(graft.functions.AdjacentJoin(col("sym"), Sep)).as("pair"), col("n"))
            .groupBy("pair").agg(sum(col("n")).as("c"))
            .orderBy(col("c").desc, col("pair")).limit(1).collect()
          rounds += 1
          actions += 1
          zeroStreak = 0
          if (top.isEmpty) exhausted = true
          else {
            val Array(a, b) = top(0).getString(0).split(Sep, 2)
            merges += ((rank, a, b, a + b, top(0).getLong(1)))
            pending += ((a, b))
            mintedEver += (a + b)
            rank += 1
          }
          spec = Nil
        }

        // rewrite + shrink check when enough merges are pending (or the
        // run is ending)
        if (pending.size >= RewritePendingCap || rank > numMerges || exhausted) {
          rewrite(pending.toSeq); pending.clear()
          if (maxVocabRows > 0 && rank <= numMerges && !exhausted) {
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
    }
    rewrite(pending.toSeq)
    vocab.unpersist()
    lastDistributedRounds = rounds
    lastDistributedActions = actions
    merges.result()
  }

  /** Heuristic greedy simulation for the next round's speculation list —
    * correctness-free by design (every prediction is re-verified against
    * fresh data): repeatedly pick the argmax from the known-exact counts,
    * retire it, and apply first-order effects from the base triple window
    * (destroyed context pairs, created merged-symbol pairs). Stops at the
    * horizon, where predictions stop being informed. */
  private def simulate(exactState: mutable.HashMap[String, Long],
      baseTriples: mutable.HashMap[String, Long], horizon: Long,
      seed: Option[(String, String)]): Seq[(String, String)] = {
    val count = mutable.HashMap[String, Long]() ++= exactState
    // triple indexes: for merge (y,z), triples (x,y,z) destroy (x,y) and
    // create (x, yz); for merge (x,y), triples (x,y,z) destroy (y,z) and
    // create (xy, z)
    val byRight = mutable.HashMap[String, mutable.ArrayBuffer[(String, Long)]]()
    val byLeft = mutable.HashMap[String, mutable.ArrayBuffer[(String, Long)]]()
    baseTriples.foreach { case (t, tc) =>
      val p = t.split(Sep, 3)
      if (p.length == 3 && tc > 0) {
        byRight.getOrElseUpdate(p(1) + Sep + p(2), mutable.ArrayBuffer()) += ((p(0), tc))
        byLeft.getOrElseUpdate(p(0) + Sep + p(1), mutable.ArrayBuffer()) += ((p(2), tc))
      }
    }
    val out = mutable.ArrayBuffer[(String, String)]()
    var going = true
    while (going && out.size < SpecDepth) {
      var amKey: String = null
      var amC = Long.MinValue
      count.foreach { case (key, c) =>
        if (c > amC || (c == amC && amKey != null && utf8Compare(key, amKey) < 0)) {
          amKey = key; amC = c
        }
      }
      if (amKey == null || amC <= horizon) going = false
      else {
        val Array(a, b) = amKey.split(Sep, 2)
        out += ((a, b))
        count.remove(amKey)
        val m = a + b
        byRight.getOrElse(amKey, mutable.ArrayBuffer()).foreach { case (x, tc) =>
          val dk = x + Sep + a
          count.get(dk).foreach(c => count(dk) = math.max(0L, c - tc))
          count(x + Sep + m) = count.getOrElse(x + Sep + m, 0L) + tc
        }
        byLeft.getOrElse(amKey, mutable.ArrayBuffer()).foreach { case (z, tc) =>
          val dk = b + Sep + z
          count.get(dk).foreach(c => count(dk) = math.max(0L, c - tc))
          count(m + Sep + z) = count.getOrElse(m + Sep + z, 0L) + tc
        }
      }
    }
    // a mis-speculation's known true argmax must lead the list (the sim
    // reproduces it from the same exact state, but make it structural)
    seed match {
      case Some(s) if out.isEmpty || out.head != s => s +: out.toSeq
      case _ => out.toSeq
    }
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
