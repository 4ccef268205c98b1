package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.Lineage.LineageOps

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure Column
  * expressions (whole-stage codegen, no UDFs) so a 100 TB documents scan
  * stays in one codegen'd stage with column pruning intact.
  *
  * Determinism contract: every function here is reproducible in ANSI SQL
  * (the DuckDB oracle mirrors the exact expression tree); ratios are
  * emitted as floor-scaled integers (`*_ppm`) rather than rounded doubles
  * so engine rounding modes cannot diverge.
  */
object TextAnalysis {

  /** Whitespace token count without regex: separator CHARS + 1 — cheap
    * and mirrorable (`translate` deletes unmapped chars on both engines).
    * Counts space, tab, LF and CR as separators: a newline-separated doc
    * (clean() itself emits \n-joined text) must not read as one token —
    * that saturated the stopword-density credit and flattened BM25's
    * length normalization. Consecutive whitespace still overcounts by
    * design (a heuristic counter, not a tokenizer — [[bpeTokenCount]] is
    * the exact one). */
  def tokenCount(text: Column): Column =
    (length(text) - length(translate(text, " \t\n\r", "")) + lit(1)).cast("long")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (regexp shared verbatim with the
    * oracle — same semantics in Java regex and RE2). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** Characters that are not lowercase letters, digits or spaces. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-z0-9 ]", "")).cast("long")

  /** Per-doc repetition ratio: occurrences of the doc's MOST repeated
    * k-gram over all k-gram occurrences, floor-scaled to ppm (integer
    * division — engine-exact). The standard degenerate-text signal for
    * quality filtering: natural text scores low, "aaaa…"/looped spam
    * scores near 1e6. Two hash aggregates, both with map-side combine. */
  def repetitionPpm(docs: org.apache.spark.sql.DataFrame,
                    idCol: String, textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    // one-pass per-row kernel — the former explode + two shuffled hash
    // aggregates computed the same per-doc counts with two corpus-wide
    // exchanges (result-identical, TextKernelsSpec). Null-text rows are
    // dropped EXPLICITLY (the old explode shape emitted a spurious
    // rep_ppm=1000000 for them — the NULL gram was counted); ids are
    // expected unique (per-doc operator). The per-row heap bound holds by
    // construction INSIDE the kernel: rows over
    // [[graft.functions.TextKernels.RepetitionMapMaxChars]] fall back to
    // an exact offset-sort (~8 B/char instead of ~80 B/distinct-gram), so
    // the operator stays a single scan + projection — a threshold UNION
    // to the distributed variant was measured 2.5-3x slower warm purely
    // from the second corpus scan its runtime-empty branch plans.
    // [[repetitionPpmDistributed]] remains for corpora where even
    // 8×(row size) per task is too much.
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        graft.functions.RepetitionPpm(col(textCol), k).as("rep_ppm"))

  /** Spill-safe distributed variant of [[repetitionPpm]] for unbounded
    * document sizes: the explode + two-aggregate shape shards a single
    * document's grams across partitions (shuffle keyed by (doc, gram)),
    * so no single task ever holds a whole document's gram set. Identical
    * results (TextKernelsSpec); ~8x slower on normal corpora. */
  def repetitionPpmDistributed(docs: org.apache.spark.sql.DataFrame,
                    idCol: String, textCol: String, k: Int): org.apache.spark.sql.DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(transform(
          sequence(lit(1), greatest(length(col(textCol)) - lit(k - 1), lit(1))),
          i => col(textCol).substr(i, lit(k)))).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max("__c").as("__max_c"), sum("__c").as("__n"))
      .select(col(idCol),
        expr("(__max_c * 1000000) div __n").as("rep_ppm"))

  /** Corpus term table over the BPE-ish token regex: per token, document
    * frequency and total occurrences — the vocabulary/IDF building block
    * of a training pipeline. One explode + one hash aggregate with
    * map-side combine (token cardinality ≪ token instances, so partial
    * aggregation collapses the shuffle); integer-only outputs, so the SQL
    * oracle is exact. */
  def termCounts(docs: org.apache.spark.sql.DataFrame,
                 idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("__doc"),
        explode(regexp_extract_all(col(textCol),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("token"))
      .groupBy("token")
      .agg(countDistinct(col("__doc")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))

  /** Token-frequency drift between two corpus snapshots — the monitoring
    * report a continuously-crawled corpus runs between crawls: per token,
    * occurrence counts and floor-scaled frequency (ppm of each side's
    * token mass), and the ppm delta. A spam infusion, a scraper
    * regression, or a topic shift all surface as top-|delta| movers
    * before any model ever trains on the data. `minCount` bounds the
    * report to tokens with real mass (the Zipf tail would otherwise
    * dominate the output rows).
    *
    * Scale shape: each snapshot reduces to a VOCAB-sized count table
    * (explode + hash aggregate with map-side combine) which is
    * checkpointed once — each corpus is scanned once even though its
    * counts feed both the token join and the 1-row total; the full-outer
    * join and everything after it touch only vocab-sized tables. Integer
    * arithmetic end to end (exact for snapshots under ~9.2e12 tokens —
    * the uniformMixWeights bound); an EMPTY side reads as total 1, so
    * its ppm column is all zeros instead of a divide-by-null. */
  def termDrift(oldDocs: org.apache.spark.sql.DataFrame,
                newDocs: org.apache.spark.sql.DataFrame,
                textCol: String, minCount: Long): org.apache.spark.sql.DataFrame = {
    def counts(df: org.apache.spark.sql.DataFrame, n: String) =
      df.filter(col(textCol).isNotNull)
        .select(explode(regexp_extract_all(col(textCol),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(n))
        .lineageCut()
    val oldC = counts(oldDocs, "old_n")
    val newC = counts(newDocs, "new_n")
    val oldT = oldC.agg(greatest(sum("old_n"), lit(1L)).as("__ot"))
    val newT = newC.agg(greatest(sum("new_n"), lit(1L)).as("__nt"))
    oldC.join(newC, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("new_n"), lit(0L)).as("new_n"))
      .crossJoin(broadcast(oldT)).crossJoin(broadcast(newT))
      .filter(col("old_n") + col("new_n") >= minCount)
      .select(col("token"), col("old_n"), col("new_n"),
        expr("(old_n * 1000000) div __ot").as("old_ppm"),
        expr("(new_n * 1000000) div __nt").as("new_ppm"))
      .withColumn("delta_ppm", col("new_ppm") - col("old_ppm"))
  }

  /** Top-k characteristic terms per group by log-free tf·idf: per-group
    * term frequency × integer reciprocal document frequency
    * `(N * 1e6) div df` (the q_keyword_search weighting, applied to the
    * whole vocabulary instead of a fixed keyword list). Tokens shorter
    * than `minLen` are dropped as noise. Shape at 100 TB: the two
    * aggregations shuffle exploded tokens (map-side partial combine on
    * both), then the vocabulary-sized df table joins the
    * (group, token)-sized tf table — both post-agg, orders of magnitude
    * smaller than the corpus — and the window ranks within groups. */
  def tfIdfTopTerms(docs: org.apache.spark.sql.DataFrame,
                    idCol: String, textCol: String, groupCol: String,
                    minLen: Int, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE corpus scan: df, tf and the doc count all read the exploded
    // token projection, which would otherwise re-run the regex explode
    // per consumer (the keywordSearch/termDrift checkpoint discipline)
    val toks = docs.select(col(idCol).as("__doc"), col(groupCol),
        explode(regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0))).as("token"))
      .filter(length(col("token")) >= minLen)
      .lineageCut()
    // N = TOTAL corpus docs (not token-bearing docs — the oracle's df
    // semantics); a count(*) scan is parquet-footer metadata, not data
    val n = docs.agg(count(lit(1)).as("__n"))
    val df = toks.groupBy("token").agg(countDistinct(col("__doc")).as("df"))
    val tf = toks.groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("tf"))
    // df is VOCABULARY-sized (grows with the corpus): hash-build it on
    // the token key, never broadcast (q_lm_score hazard class)
    val scored = tf.join(df.hint("shuffle_hash"), "token").crossJoin(n)
      .select(col(groupCol), col("token"), col("tf"), col("df"),
        expr("tf * ((__n * 1000000) div df)").as("score_ppm"))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy(groupCol)
        .orderBy(col("score_ppm").desc, col("token"))))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("rnk"), col("token"), col("tf"), col("df"),
        col("score_ppm"))
  }

  /** Top-k adjacent-bigram collocations with an integer-exact lift score —
    * the corpus-statistics table a tokenizer/mix design reads to spot
    * multi-word units and template phrases (classic collocation analysis;
    * lift = observed pair rate over the independence expectation, the
    * log-free cousin of PMI so the oracle agrees bit-for-bit):
    * `lift_ppm = (((1e6 * c_xy) div c_x) * N) div c_y`.
    *
    * Scale shape: ONE corpus scan materializes the token arrays (the
    * clean() checkpoint discipline — unigram and bigram counts both read
    * them); both counts are hash aggregates with map-side combine; the
    * top-k is a bounded TakeOrdered on the post-agg bigram table; the two
    * unigram probe joins broadcast the K-ROW side, so the vocabulary
    * table never shuffles. Bigram enumeration is the codegen'd
    * [[graft.functions.AdjacentJoin]] kernel — no interpreted HOF, no
    * lead()-window shuffle. Overflow bound: the first factor is <= 1e6
    * (c_xy <= c_x), so the product stays in BIGINT while N <= 9.2e12
    * tokens (~35 TB of text) — shard the analysis beyond that. */
  def collocations(docs: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val t = docs.select(
        regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0)).as("__toks"))
      .lineageCut()
    val uni = t.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .lineageCut() // feeds the total and both probe joins
    val tot = uni.agg(sum(col("c")).as("__n"))
    val top = t.select(
        explode(graft.functions.AdjacentJoin(col("__toks"), " ")).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_xy"))
      .orderBy(col("c_xy").desc, col("bigram"))
      .limit(k)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
    val j1 = broadcast(top)
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
    broadcast(j1)
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
      .crossJoin(broadcast(tot))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        expr("(((1000000 * c_xy) div c_x) * __n) div c_y").as("lift_ppm"))
  }

  /** Bigram language-model quality score — the CCNet-family statistical
    * signal the heuristic scores (length/punct/stopword) cannot see: how
    * TYPICAL a document's word transitions are under a model trained on
    * the corpus itself. Real CCNet bills log-perplexity under an external
    * LM; this is the log-free integer-exact cousin (the collocation-lift
    * precedent): per adjacent word pair, the corpus conditional
    * `p_ppm = (c(w1,w2) * 1e6) div c(w1,·)`, and per doc the floor mean
    * and minimum over its pairs — template spam scores high, mojibake and
    * word-salad score low, and the minimum flags the single most alien
    * transition. Every step is integer math → the DuckDB oracle agrees
    * bit-for-bit.
    *
    * Scale shape: ONE corpus scan materializes the slim (id, pair) table
    * (eager checkpoint — the clean()/collocations discipline: it feeds
    * BOTH the model build and the scoring join; swap for `checkpoint()`
    * on a cluster). The bigram model is a hash aggregate with map-side
    * combine; prefix counts derive from the MODEL table (model-sized, not
    * corpus-sized); scoring is one corpus-sized equi-join on the pair key
    * (the model is vocabulary-shaped — too big to assume broadcastable at
    * 100 TB, small enough that AQE broadcasts it at bench scale) and one
    * per-doc aggregate. Bigrams via the codegen'd [[graft.functions.AdjacentJoin]]
    * kernel; tokens are `[a-z]+` runs so the space join is unambiguous.
    * Overflow bound: `c2 * 1e6` stays in BIGINT while the corpus holds
    * <= 9.2e12 bigrams (~35 TB of text) — shard beyond that, as
    * [[collocations]] documents. Docs with fewer than two word tokens
    * have no transitions and are absent by construction (both engines).
    *
    * Returns (idCol, n_bigrams, lm_avg_ppm, lm_min_ppm). */
  def lmScore(docs: org.apache.spark.sql.DataFrame,
              idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val pairs = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.AdjacentJoin(
          regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0)), " ")).as("__pair"))
      .lineageCut()
    val c2 = pairs.groupBy("__pair").agg(count(lit(1)).as("__c2"))
    val c1 = c2.groupBy(substring_index(col("__pair"), " ", 1).as("__w1"))
      .agg(sum(col("__c2")).as("__c1"))
    // hash-build BOTH model-side joins: every table here is CORPUS-DERIVED
    // (the occurrence table is corpus-sized, c1/model are vocabulary-sized
    // and grow with it), and the checkpointed occurrence table's
    // ExistingRDD stats are unreliable — left alone the planner BROADCAST
    // the whole per-occurrence pair table as the scoring join's build
    // (measured 40 MiB -> 1.36 GiB peak task from x1 to x30, linear in
    // corpus: the r12 footprint sweep's headline catch). A shuffle-hash
    // build bounds each task at one partition of the vocabulary-sized
    // side and nothing corpus-scale is ever broadcast or sorted.
    val model = c2
      .withColumn("__w1", substring_index(col("__pair"), " ", 1))
      .join(c1.hint("shuffle_hash"), "__w1")
      .select(col("__pair"), expr("(__c2 * 1000000) div __c1").as("__p_ppm"))
    pairs.join(model.hint("shuffle_hash"), "__pair")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_bigrams"),
        expr("sum(__p_ppm) div count(1)").as("lm_avg_ppm"),
        min(col("__p_ppm")).as("lm_min_ppm"))
  }

  /** [[lmScore]] with the model trained on a SEPARATE reference corpus —
    * the real CCNet shape: score a fresh crawl under the TRUSTED
    * snapshot's language model instead of its own (a self-model grades
    * uniform spam as typical; a reference model grades it alien). The
    * cross-corpus twist is unseen transitions: a target bigram absent
    * from the reference model scores `p_ppm = 0` (maximally atypical) and
    * is counted in `n_unseen` — the two together separate "rare but
    * plausible" from "never seen" drift, the doc-level complement of
    * [[termDrift]]'s corpus-level report.
    *
    * Scale shape: the reference reduces to a model-sized bigram table
    * (one scan; the c2 table is checkpointed because it feeds both the
    * prefix-count aggregate and the model join); the target side is one
    * scan + one equi-join on the pair key + one per-doc aggregate —
    * exactly the [[lmScore]] shape with a left join. Same ~9.2e12-bigram
    * BIGINT bound; docs with fewer than two word tokens are absent by
    * construction on both engines.
    *
    * Returns (idCol, n_bigrams, n_unseen, lm_avg_ppm, lm_min_ppm). */
  def lmScoreAgainst(refDocs: org.apache.spark.sql.DataFrame,
                     docs: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val refPairs = refDocs
      .filter(col(textCol).isNotNull)
      .select(explode(graft.functions.AdjacentJoin(
        regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0)), " ")).as("__pair"))
    val c2 = refPairs.groupBy("__pair").agg(count(lit(1)).as("__c2"))
      .lineageCut()
    val c1 = c2.groupBy(substring_index(col("__pair"), " ", 1).as("__w1"))
      .agg(sum(col("__c2")).as("__c1"))
    // same hash-build discipline as lmScore: the reference model tables
    // are corpus-derived (vocabulary-sized) and c2 is a checkpointed
    // ExistingRDD with unreliable stats — never let the planner broadcast
    // or sort-merge them against the target's per-occurrence stream.
    val model = c2
      .withColumn("__w1", substring_index(col("__pair"), " ", 1))
      .join(c1.hint("shuffle_hash"), "__w1")
      .select(col("__pair"), expr("(__c2 * 1000000) div __c1").as("__p_ppm"))
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(graft.functions.AdjacentJoin(
          regexp_extract_all(col(textCol), lit("[a-z]+"), lit(0)), " ")).as("__pair"))
      .join(model.hint("shuffle_hash"), Seq("__pair"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("__p_ppm").isNull, 1L).otherwise(0L)).as("n_unseen"),
        expr("sum(coalesce(__p_ppm, 0L)) div count(1)").as("lm_avg_ppm"),
        min(coalesce(col("__p_ppm"), lit(0L))).as("lm_min_ppm"))
  }

  /** Non-overlapping occurrences of `word` with space padding. */
  def occurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) / lit(needle.length)).cast("long")
  }

  /** Stopword-profile language ID over {en, de, fr, es}; ties break in that
    * order; all-zero → "und". A real system would use char-n-gram profiles —
    * the declared query keeps the heuristic SQL-mirrorable. */
  def langId(text: Column): Column = {
    def score(words: String*): Column =
      words.map(occurrences(text, _)).reduce(_ + _)
    val en = score("the", "and", "of")
    val de = score("der", "und", "die")
    val fr = score("le", "et", "la")
    val es = score("el", "y", "los")
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Quality score in parts-per-million: length component + stopword
    * density + punctuation penalty. Same expression tree as the oracle. */
  def qualityScorePpm(text: Column): Column = {
    val chars = length(text).cast("double")
    val tokens = tokenCount(text).cast("double")
    val stops = (occurrences(text, "the") + occurrences(text, "and") +
      occurrences(text, "of") + occurrences(text, "a")).cast("double")
    val punct = punctCount(text).cast("double")
    val lenScore = least(lit(1.0), chars / lit(500.0))
    val stopScore = least(lit(1.0), stops * lit(10.0) / tokens)
    val punctPenalty = lit(1.0) - least(lit(1.0), punct / (chars * lit(0.1) + lit(1.0)))
    floor((lenScore * lit(0.3) + stopScore * lit(0.4) + punctPenalty * lit(0.3)) * lit(1000000)).cast("long")
  }

  /** Content fingerprint: first 16 hex chars of md5. */
  def fingerprint(text: Column): Column = substring(md5(text.cast("binary")), 1, 16)

  /** Winnowing-style shingle fingerprint: the minimum md5 over all k-char
    * shingles — robust to local edits, cheap to compare. Native one-pass
    * kernel ([[graft.functions.MinShingleMd5]]) — the former
    * `array_min(transform(...))` ran one interpreted md5 per shingle
    * (bit-identical replacement, TextKernelsSpec). */
  def minShingleFingerprint(text: Column, k: Int): Column =
    graft.functions.MinShingleMd5(text, k)

  /** k-char shingle set (distinct, first-occurrence order) of a text
    * column. Native one-pass kernel ([[graft.functions.ShingleSet]]) —
    * the former `array_distinct(transform(...))` ran one interpreted
    * substr per shingle (bit-identical replacement, ShingleKernelsSpec). */
  def shingles(text: Column, k: Int): Column =
    graft.functions.ShingleSet(text, k)

  /** k-char shingle set packed into longs (base-256 per char — ASCII text
    * only, k ≤ 7). Long-array set ops are several times cheaper than
    * string-array ones in the pairwise intersect, and the encoding is
    * injective so Jaccard over packed shingles is EXACTLY Jaccard over
    * string shingles (and is mirrored 1:1 by the SQL oracle). Native
    * one-pass kernel ([[graft.functions.PackedShingleSet]]) — the former
    * formulation ran k interpreted ascii×substr evals per shingle. */
  def shinglesPacked(text: Column, k: Int): Column =
    graft.functions.PackedShingleSet(text, k)

  /** Exact Jaccard similarity of two shingle arrays, in ppm (integer —
    * exact on both engines). */
  def jaccardPpm(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("long")
    // greatest(.., 1): two empty sets are 0 ppm, not a NaN → ANSI-cast error
    val union = greatest(
      size(a).cast("long") + size(b).cast("long") - inter, lit(1L))
    (inter * lit(1000000L) / union).cast("long")
  }

  /** Per-row text normalization — the universal first stage of a
    * pretraining pipeline: newline canonicalization (CRLF / lone CR → LF),
    * tabs → spaces, control-character strip (C0 minus LF, plus DEL), space
    * runs collapsed, and spaces trimmed at line boundaries and string ends.
    * Pure codegen'd string ops, byte-deterministic → mirrored exactly by
    * the DuckDB oracle (`regexp_replace` with the same RE2/Java-compatible
    * patterns). */
  def normalize(text: Column): Column = {
    val lfOnly = replace(replace(text, lit("\r\n"), lit("\n")), lit("\r"), lit("\n"))
    val tabbed = replace(lfOnly, lit("\t"), lit(" "))
    val noCtrl = regexp_replace(tabbed, "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")
    val collapsed = regexp_replace(noCtrl, " +", " ")
    trim(regexp_replace(collapsed, " *\n *", "\n"), " ")
  }

  /** Corpus-level cleaning: [[normalize]] every document, split into
    * lines, drop boilerplate lines — a line is boilerplate when it appears
    * in more than `maxLineDf` distinct documents (site headers, footers,
    * nav chrome) — and reassemble the surviving lines in order.
    *
    * Scale shape: the line explode is linear in corpus size; the line
    * document-frequency aggregate has map-side combine; the boilerplate
    * set (lines with df > threshold) is Zipf-head-SHAPED but still
    * corpus-derived — at 100 TB every common sentence qualifies, so the
    * anti-join hash-builds one partition of it per task rather than
    * broadcasting (r12; the corpus-sized shuffles are the line table and
    * the per-doc reassembly). Output keeps every input document
    * (all-boilerplate docs come back as the empty string).
    *
    * Returns (idCol, text_clean, n_lines_kept, n_lines_dropped). */
  def clean(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
            maxLineDf: Long): org.apache.spark.sql.DataFrame = {
    // ONE corpus scan: the normalized projection feeds three consumers
    // (the line-df aggregate, the anti-join's line table, and the final
    // keep-every-doc left join), so materialize it eagerly — the
    // connectedComponents / q_pipeline_e2e checkpoint discipline (owns
    // its blocks, frees them with the reference; spark.graft.checkpoint
    // .dir makes it reliable — see Lineage). Without it each consumer
    // re-runs the regex-heavy
    // normalize over the full corpus.
    val norm = docs.select(col(idCol), normalize(col(textCol)).as("__t"))
      .lineageCut()
    val lines = norm.select(col(idCol),
      posexplode(split(col("__t"), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines.groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") > maxLineDf)
      .select("__line")
    // hash-build the boilerplate side, never broadcast: "tiny Zipf head"
    // holds on a small corpus, but at 100 TB the set of lines appearing
    // in > maxLineDf docs is itself vocabulary-scale (every common
    // sentence qualifies) — a corpus-derived broadcast, the q_lm_score
    // hazard class (r12 checkpoint-broadcast sweep catch)
    val kept = lines.join(boiler.hint("shuffle_hash"), Seq("__line"), "left_anti")
    val reassembled = kept.groupBy(idCol).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line")), "\n").as("__clean"),
      count(lit(1)).as("__kept"))
    // explicit NULL-text policy (the dedupLines discipline): a null doc
    // stays NULL with 0 kept / 0 dropped — the old shape returned
    // text_clean = '' with n_lines_dropped = NULL, conflating an upstream
    // decode failure with a legitimately all-boilerplate doc AND breaking
    // kept+dropped accounting (sum over a null silently skips the row)
    // reassembled is PER-DOC with full cleaned text — corpus-sized, so the
    // keep-every-doc join hash-builds instead of broadcasting it
    norm.join(reassembled.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__t").isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("__clean"), lit(""))).as("text_clean"),
        coalesce(col("__kept"), lit(0L)).as("n_lines_kept"),
        when(col("__t").isNull, lit(0L))
          .otherwise(size(split(col("__t"), "\n")).cast("long")
            - coalesce(col("__kept"), lit(0L))).as("n_lines_dropped"))
  }

  /** HTML-to-text extraction — the stage BEFORE any cleaning/scoring in a
    * web-corpus pipeline: drop script/style blocks (content and all),
    * strip remaining tags, decode the ubiquitous named/numeric entities,
    * collapse whitespace. Pure chained codegen'd `regexp_replace` /
    * `replace` (one scan, no shuffle), byte-deterministic and RE2-safe →
    * mirrored exactly by the DuckDB oracle.
    *
    * Entity order is the classic single-decode rule: specific entities
    * first, `&amp;` LAST — decoding the ampersand first would turn
    * `&amp;lt;` into `&lt;` and then into `<` (double decode); this chain
    * yields the correct literal `&lt;`. Whitespace class is explicit
    * (`[ \t\r\n]`) because Java's `\s` and RE2's `\s` disagree on
    * vertical tab. */
  def extractHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    val decoded = replace(ent, lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** Count of angle-bracket tag spans in raw markup (diagnostic column
    * next to [[extractHtml]]; over-counts bare `<`/`>` pairs in script
    * text — deterministic and mirrored, which is what matters). */
  def htmlTagCount(html: Column): Column =
    size(regexp_extract_all(html, lit("<[^>]+>"), lit(0))).cast("long")

  /** Intra-document duplicate-line removal — the C4/RefinedWeb "remove
    * repeated lines within a page" pass: web pages repeat nav chrome,
    * cookie banners and list fragments INSIDE one document, which
    * [[clean]]'s corpus-level line-df drop cannot see (a line unique to
    * one doc never crosses the df threshold however often it repeats
    * there). Keeps the FIRST occurrence of each distinct line per doc,
    * preserves original order, and reports kept/dropped counts.
    *
    * Scale shape: two shuffles, both corpus-linear and both carrying the
    * doc id — first-occurrence selection groups on (doc, line), the
    * reassembly groups on doc. No join back to the corpus: every non-null
    * doc has >=1 line, so the second aggregate already covers all docs,
    * and the dropped count falls out of the per-line multiplicities
    * (sum(cnt) - count). Null-text docs are excluded up front (one
    * declared null policy on BOTH engines — the q_repetition lesson).
    *
    * Returns (idCol, text_dedup, n_lines_kept, n_lines_dropped). */
  def dedupLines(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String): org.apache.spark.sql.DataFrame = {
    val lines = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val first = lines.groupBy(col(idCol), col("__line"))
      .agg(min(col("__pos")).as("__pos"), count(lit(1)).as("__cnt"))
    first.groupBy(idCol).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line")), "\n").as("text_dedup"),
      count(lit(1)).as("n_lines_kept"),
      (sum(col("__cnt")) - count(lit(1))).as("n_lines_dropped"))
  }

  /** Encoding-sanity intake report — the first thing a corpus owner
    * checks on a new source: how much of each slice carries the scars of
    * a broken decode pipeline. Per group: doc counts containing U+FFFD
    * replacement characters (a decoder already gave up once), C0/DEL
    * control characters (binary bleed-through), any non-ASCII at all
    * (overlaps the previous two — each column answers its own question),
    * plus the floor-scaled ASCII share of the slice's characters. Pure
    * codegen'd regex counting + one map-side-combinable aggregate — one
    * scan, one slim-key shuffle at 100 TB. BMP-only counting contract:
    * Spark `length` counts UTF-16 units while SQL engines count
    * codepoints, so astral-plane text diverges by design — the report is
    * a diagnostic for BROKEN encodings, which live in the BMP. */
  def encodingReport(docs: org.apache.spark.sql.DataFrame,
                     textCol: String, groupCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    def hasDocs(pattern: String, name: String) =
      sum(when(t.rlike(pattern), 1L).otherwise(0L)).as(name)
    docs.filter(t.isNotNull)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        hasDocs("\uFFFD", "n_mojibake_docs"),
        hasDocs("[\\x00-\\x08\\x0B-\\x1F\\x7F]", "n_ctrl_docs"),
        hasDocs("[^\\x00-\\x7F]", "n_nonascii_docs"),
        sum(length(regexp_replace(t, "[^\\x00-\\x7F]", "")).cast("long")).as("__ascii"),
        sum(length(t).cast("long")).as("__chars"))
      .select(col(groupCol), col("n_docs"), col("n_mojibake_docs"),
        col("n_ctrl_docs"), col("n_nonascii_docs"),
        expr("(__ascii * 1000000) div greatest(__chars, 1L)").as("ascii_ppm"))
  }

  /** Corpus-wide keep-FIRST line dedup — the RefinedWeb/CCNet-style pass
    * that [[dedupLines]] (intra-doc) and [[clean]] (df-threshold drop)
    * cannot express: every distinct line survives in exactly ONE place,
    * the document where it first appears (global first = min
    * (doc, position) instance), and every later occurrence — in other
    * docs or later in the same doc — is dropped. Catches cross-page
    * boilerplate below any df threshold while provably never deleting
    * content outright.
    *
    * Scale shape (the skew lesson from the LSH band joins): first-
    * occurrence selection is a hash AGGREGATE `min(struct(doc, pos))` on
    * the line digest — map-side combine absorbs a line that appears in
    * millions of docs, where the window-rank formulation (`row_number
    * over (partition by line)`) would sort one hot partition. The keeper
    * table (one slim row per DISTINCT line) then equi-joins back on the
    * digest — probe-side skew only, absorbed by AQE skew split — and
    * reassembly groups on the doc id. Lines join by md5 digest, not
    * text, so the corpus-sized shuffles carry each line's text exactly
    * once (the exact-dedup collision discipline: 128-bit digest over
    * ~corpus-cardinality lines).
    *
    * Every non-null input doc returns (all-duplicate docs come back as
    * the empty string — distinguishable from the untouched doc by
    * `n_lines_kept = 0`); null-text docs are excluded up front (the
    * declared null policy both engines share).
    *
    * Returns (idCol, text_dedup, n_lines_kept, n_lines_dropped). */
  def dedupLinesCorpus(docs: org.apache.spark.sql.DataFrame, idCol: String,
                       textCol: String, sep: String = "\n"): org.apache.spark.sql.DataFrame = {
    // `sep` is both the split pattern and the reassembly joiner, so it
    // must be a regex-metachar-free literal ("\n" lines, "\n\n"
    // paragraphs — the C4 unit); a regex-only separator would not
    // round-trip the reassembly.
    // ONE corpus scan: the exploded line table feeds three consumers
    // (keeper aggregate, keep-join probe, per-doc totals) — without the
    // eager materialization each one re-reads and re-explodes the corpus
    // (3 scans at 100 TB). The clean()/connectedComponents checkpoint
    // discipline: owns its blocks, frees them with the reference; swap
    // for checkpoint() on a cluster.
    val lines = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__d", md5(col("__line").cast("binary")))
      .lineageCut()
    val keeper = lines.groupBy("__d")
      .agg(min(struct(col(idCol), col("__pos"))).as("__first"))
      .select(col("__d"), col("__first").getField(idCol).as("__kid"),
        col("__first").getField("__pos").as("__kpos"))
    // keeper is per-DISTINCT-LINE (corpus-vocabulary-sized) and
    // reassembled is per-DOC with full deduped text (corpus-sized):
    // hash-build both join-backs, never broadcast (the q_lm_score hazard
    // class — r12 checkpoint-broadcast sweep catch)
    val kept = lines.join(keeper.hint("shuffle_hash"), "__d")
      .filter(col(idCol) === col("__kid") && col("__pos") === col("__kpos"))
    val reassembled = kept.groupBy(idCol).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line")), sep).as("__dedup"),
      count(lit(1)).as("__kept"))
    lines.groupBy(idCol).agg(count(lit(1)).as("__total"))
      .join(reassembled.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__dedup"), lit("")).as("text_dedup"),
        coalesce(col("__kept"), lit(0L)).as("n_lines_kept"),
        (col("__total") - coalesce(col("__kept"), lit(0L))).as("n_lines_dropped"))
  }

  /** Boilerplate-frequency report — the diagnostic a corpus owner reads
    * BEFORE picking [[clean]]'s `maxLineDf` threshold: every line whose
    * document frequency reaches `minDf`, with its distinct-doc count,
    * total occurrence count, and the floor-scaled share of corpus docs
    * that contain it. The report is Zipf-head small by construction
    * (df >= minDf lines are exactly the ones that repeat).
    *
    * Scale shape: one explode + one hash aggregate with map-side combine
    * (the [[clean]] df-aggregate, reported instead of consumed); the
    * doc-count side is a single broadcast row. Integer-only outputs —
    * oracle-exact. */
  def boilerplateReport(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, minDf: Long): org.apache.spark.sql.DataFrame = {
    val nonNull = docs.filter(col(textCol).isNotNull)
    val total = nonNull.agg(count(lit(1)).as("__total"))
    nonNull
      .select(col(idCol), explode(split(col(textCol), "\n")).as("line"))
      .groupBy("line")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDf)
      .crossJoin(broadcast(total))
      .select(col("line"), col("n_docs"), col("n_occurrences"),
        expr("(n_docs * 1000000) div __total").as("doc_ppm"))
  }

  /** PII patterns for [[redactPii]]/[[piiCounts]] — deliberately simple,
    * deterministic, RE2-safe regexes (no lookaround, no backrefs) of the
    * kind every public pretraining pipeline ships as its first privacy
    * pass: emails, IPv4 literals, and international-ish phone numbers.
    * Order is most-specific-first and matters: emails redact before
    * anything touches their digit runs, and IPv4 before phones — a dotted
    * quad is a subset of the phone pattern and would otherwise be
    * swallowed as <PHONE>. */
  private[operators] val PiiRules: Seq[(String, String, String)] = Seq(
    // (name, pattern, replacement token)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "\\+?[0-9][0-9()\\[\\] .-]{6,}[0-9]", "<PHONE>"))

  /** Redact PII spans with typed placeholder tokens — the privacy pass a
    * training corpus runs before anything else ships. Pure codegen'd
    * chained `regexp_replace` (one scan, no shuffle); the same patterns
    * evaluate identically under RE2, so the oracle mirrors the chain. */
  def redactPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (_, pat, tok)) => regexp_replace(c, pat, tok) }

  /** Per-rule PII hit counts (after upstream rules redact — same order as
    * [[redactPii]], so counts reflect what redaction would remove). */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val redactedUpTo = PiiRules.scanLeft(text) {
      case (c, (_, pat, tok)) => regexp_replace(c, pat, tok)
    }
    PiiRules.zip(redactedUpTo).map { case ((name, pat, _), pre) =>
      name -> size(regexp_extract_all(pre, lit(pat), lit(0))).cast("long")
    }
  }

  /** Keyword relevance search: score every document against a fixed term
    * set and return the top k — the retrieval building block (dataset
    * curation "find me docs about X", eval-set mining). Weighting is
    * tf × reciprocal document frequency, integer-exact:
    * `w(t) = (N · 10^6) div df(t)`, `score(d) = Σ_t tf(t,d) · w(t)` —
    * the log-free cousin of tf-idf chosen deliberately so the SQL oracle
    * reproduces every bit (ln() differs across libms; integer division
    * does not). tf is the space-padded non-overlapping occurrence count
    * ([[occurrences]] — the same oracle-proven primitive langid uses).
    *
    * Shape at 100 TB: per-doc tfs are ONE codegen'd projection (slim:
    * id + one long per term, eagerly checkpointed — the df aggregate and
    * the scorer both consume it); df/N reduce to a single broadcast row;
    * the top k is a TakeOrderedAndProject, never a global sort. */
  def keywordSearch(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, terms: Seq[String], k: Int): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && k > 0)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      occurrences(col(textCol), t).as(s"__tf$i")
    }
    val tf = docs.select(Seq(col(idCol)) ++ tfCols: _*).lineageCut()
    val dfAgg = tf.agg(
      count(lit(1)).as("__n"),
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val scored = tf.crossJoin(broadcast(dfAgg))
    // df can be 0 when a term misses the whole corpus: its weight is then
    // irrelevant (every tf is 0) — guard the division anyway. SQL `div`
    // is true integer division (exact on both engines, unlike `/`).
    val score = expr(terms.indices
      .map(i => s"__tf$i * ((__n * 1000000L) div greatest(__df$i, 1L))")
      .mkString(" + "))
    scored.select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BM25 retrieval, integer-exact. Classic Okapi shape (Robertson et al.,
    * public literature) with three deliberate integer re-derivations so
    * any engine reproduces the ranking bit-for-bit:
    *
    *  - the term weight is the same reciprocal-df `(n·10⁶) div df` as
    *    [[keywordSearch]] (log-IDF needs floats);
    *  - avgdl is floored once to the integer `A = max(Σdl div n, 1)`;
    *  - the length normalization `tf·(k1+1) / (tf + k1·(1−b+b·dl/A))` is
    *    cleared of fractions by multiplying through by `10⁶·A` and floored
    *    to per-mille:
    *    `tfnorm_pm = (tf·(1000+k1m)·10⁶·A) div
    *                 (tf·10⁶·A + k1m·((1000−bm)·A + bm·dl))`
    *    with k1, b in milli-units. tfnorm_pm < 1000+k1m by construction.
    *
    * Overflow bounds (ANSI-safe by analysis, not luck): the numerator
    * needs `tf·A < 4·10⁹` (docs to ~10⁹ tokens at avg length 10⁴), the
    * score product `n·(1000+k1m) < 9·10¹⁵` (corpora to ~10¹² docs) —
    * both far beyond any real retrieval partition.
    *
    * Shape at scale: identical to [[keywordSearch]] — one checkpointed
    * slim (id, tf…, dl) projection, a broadcast one-row stats frame, and
    * a bounded top-k; the corpus text never shuffles. */
  def bm25Search(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, terms: Seq[String], k: Int,
                 k1Milli: Long = 1200L, bMilli: Long = 750L): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty && k > 0)
    require(k1Milli >= 0 && bMilli >= 0 && bMilli <= 1000L, "k1 >= 0, b in [0,1]")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      occurrences(col(textCol), t).as(s"__tf$i")
    }
    val tf = docs.select(Seq(col(idCol)) ++ tfCols ++
        Seq(tokenCount(col(textCol)).as("__dl")): _*)
      .lineageCut()
    val dfAgg = tf.agg(
      count(lit(1)).as("__n"),
      Seq(sum(col("__dl")).as("__total")) ++ terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i")): _*)
    val scored = tf.crossJoin(broadcast(dfAgg))
    val a = "greatest(__total div __n, 1L)" // floored integer avgdl
    val score = expr(terms.indices.map { i =>
      val num = s"(__tf$i * ${(1000L + k1Milli) * 1000000L}L * $a)"
      val den = s"(__tf$i * 1000000L * $a + ${k1Milli}L * " +
        s"(${1000L - bMilli}L * $a + ${bMilli}L * __dl))"
      // den = 0 only when tf = 0 (num = 0 too): greatest() keeps ANSI
      // division happy without changing any real score
      s"(((__n * 1000000L) div greatest(__df$i, 1L)) * ($num div greatest($den, 1L))) div 1000L"
    }.mkString(" + "))
    scored.select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack & Clarke's RRF, the standard hybrid-
    * retrieval combiner): each input list contributes `1e6 div (k0 + rank)`
    * per doc, summed across lists — all integer arithmetic, so a SQL
    * oracle is engine-exact. Lists are ranked top-k DataFrames with
    * (`idCol`, `rankCol`); docs absent from a list simply contribute
    * nothing (the top-k-list semantics real rerankers use). Shape: the
    * union is k·lists rows — driver-free, one tiny aggregate. */
  def rrfFuse(lists: Seq[org.apache.spark.sql.DataFrame], idCol: String,
              rankCol: String, k0: Long, topK: Int): org.apache.spark.sql.DataFrame = {
    // k0 >= 1 (not >= 0): ranks are 1-based in this codebase, but a
    // caller fusing a 0-BASED reranker list with k0 = 0 would evaluate
    // 1e6 div 0 on the first row — an ANSI DIVIDE_BY_ZERO that kills the
    // query; k0 >= 1 makes every non-negative rank safe (standard RRF
    // uses k0 = 60 anyway)
    require(lists.nonEmpty && topK > 0 && k0 >= 1,
      s"need non-empty lists, topK > 0 and k0 >= 1 (got k0=$k0)")
    lists.map(_.select(col(idCol), col(rankCol).cast("long").as("__r")))
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(expr(s"1000000L div (${k0}L + __r)")).as("rrf_ppm"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_ppm").desc, col(idCol))
      .limit(topK)
  }

  /** The whole per-document signal suite as ONE projection — at 100 TB the
    * scan IS the cost, and running the stats / quality / langid /
    * repetition / fingerprint queries separately reads the corpus five
    * times for what a single codegen'd pass produces. Every column is an
    * already-oracle-proven expression (same trees as the per-signal
    * queries); the plan is a pure map-side projection: no shuffle, no UDF,
    * scan pruned to (id, text).
    *
    * `signatures = true` appends the dedup signature columns (`simhash`,
    * `minhash_sig`) for pipelines that feed candidate generation from the
    * same scan — xxhash64-based, so NOT SQL-oracle-expressible (spec-backed
    * instead; the declared `q_doc_profile` keeps `signatures = false`).
    *
    * `fastFingerprint = true` swaps the md5 min-shingle fingerprint for
    * its xxhash64 twin (`minhash_sig` with one permutation over the same
    * 8-char shingles): the md5-per-shingle walk dominates the whole
    * profile scan (~2/3 of its forced warm cost — bench_history r6), and a
    * candidate-generation fingerprint needs stability, not md5. The md5
    * column IS the oracle contract, so the declared `q_doc_profile` keeps
    * it; `q_doc_profile_fast` is the production path (rows-only,
    * ProfileSpec pins column-for-column agreement on the shared signals).
    *
    * Null-text rows keep their id with every signal column null (the
    * kernels are null-propagating), matching a LEFT-join oracle shape —
    * except `lang_pred`, which falls through to "und" on both engines. */
  def profile(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
              signatures: Boolean = false,
              fastFingerprint: Boolean = false): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val shingleFp =
      if (fastFingerprint)
        element_at(graft.functions.MinHashSig(t, 8, 1), 1).as("shingle_fp_fast")
      else minShingleFingerprint(t, 8).as("shingle_fp")
    val base = Seq(
      col(idCol),
      length(t).cast("long").as("n_chars_calc"),
      tokenCount(t).as("n_tokens"),
      bpeTokenCount(t).as("n_tokens_bpe"),
      punctCount(t).as("n_punct"),
      qualityScorePpm(t).as("quality_ppm"),
      langId(t).as("lang_pred"),
      graft.functions.RepetitionPpm(t, 3).as("rep_ppm"),
      fingerprint(t).as("fp"),
      shingleFp)
    val sig = if (signatures)
      Seq(graft.functions.SimHashText(t).as("simhash"),
          graft.functions.MinHashSig(t, 5, 64).as("minhash_sig"))
    else Seq.empty
    docs.select(base ++ sig: _*)
  }

  /** Exact duplicate-SPAN report (dedup at the substring grain — the
    * "Deduplicating Training Data" regime, Lee et al. 2022): every L-char
    * gram occurring more than once in the corpus marks its positions;
    * per-doc positions merge into maximal spans; each doc reports how
    * many duplicated spans it carries and how many chars they cover.
    * Corpus-LINEAR (one gram per position, never pairwise).
    *
    * `exact = true` digests grams with md5 over the materialized
    * substring — collision-free by construction and mirrored verbatim by
    * the DuckDB oracle (`q_substring_dup`). `exact = false` is the
    * production path: the one-pass [[graft.functions.GramDigests]] kernel
    * (xxhash64 over byte-addressed char grams — no per-gram substring,
    * no md5, an 8-byte shuffle key), same downstream plan; SpanKernelsSpec
    * pins output parity on real data.
    */
  /** The gram half of [[duplicateSpans]]: per-position L-gram digests
    * (md5 substring when `exact`, the [[graft.functions.GramDigests]]
    * xxhash64 kernel otherwise), co-located and sorted by gram — the
    * subplan the UnsafeRow-level neighbor scan consumes. Exposed so
    * PlanAudit can pin its shape (kernel projection, exactly one gram
    * exchange), which the final query's explain no longer shows across
    * the RDD lift. */
  def spanGramScan(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, L: Int,
                   exact: Boolean): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    // fanOutKernel: the per-position gram digest (md5 or GramDigests) is
    // this operator's dominant map cost and runs single-threaded on an
    // unsplittable scan (guide §2.5; no-op on real layouts) — the
    // driver-confirmed 2.09x on q_substring_dup in r15 came from exactly
    // this fan-out (then applied blanket at the table read; now scoped
    // here where the kernel is).
    val eligible = graft.Tables.fanOutKernel(
      docs.select(col(idCol), t).filter(length(t) >= L))
    val grams =
      if (exact)
        eligible
          .select(col(idCol), t, explode(sequence(lit(1), length(t) - (L - 1))).as("p"))
          .select(col(idCol), col("p"),
            md5(expr(s"substring($textCol, p, $L)").cast("binary")).as("g"))
      else
        eligible
          .select(col(idCol),
            posexplode(graft.functions.GramDigests(t, L)).as(Seq("p0", "g")))
          .select(col(idCol), (col("p0") + 1).as("p"), col("g"))
    grams.repartition(col("g")).sortWithinPartitions("g")
  }

  def duplicateSpans(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, L: Int,
                     exact: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // duplicated-gram marking: co-locate + sort occurrences by g, then a
    // streaming one-lookahead scan — a row's gram is duplicated iff it
    // equals a sorted NEIGHBOR's. ONE exchange of the gram table, the
    // external sorter spills, O(1) task memory at ANY key skew (the
    // OrderedFold shape). The two rejected designs both pay more: a
    // Window.partitionBy(g) count buffers a hot banner gram's hundreds of
    // millions of rows in one window group, and the dup-gram aggregate +
    // marking join (the r10 first cut) runs the corpus-wide gram digest
    // or its materialization through TWO more big exchanges — measured
    // 3.2 s -> 12 s warm at sf0.1. The scan itself runs at the UnsafeRow
    // level (queryExecution.toRdd + an UnsafeProjection for the output,
    // lifted back via the InternalFrame shim): the r10 version's generic
    // RowEncoder decode/re-encode of every corpus gram was the measured
    // ~2x top-end constant vs the skew-unsafe window design (SCALING.md ‡).
    // The deferred-by-one emission buffers PRIMITIVES, never rows —
    // UnsafeRows from toRdd are reused by the scanner underneath, so a
    // value that outlives one step is copied (UTF8String and any
    // array/map/struct view — see cp()).
    // The RDD lift hides the gram subplan from the final explain, so
    // [[spanGramScan]] stays a public seam and PlanAudit pins ITS plan
    // (gram kernel, one exchange) separately from the downstream.
    val sorted = spanGramScan(docs, idCol, textCol, L, exact)
    val inSchema = sorted.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val pIdx = inSchema.fieldIndex("p")
    val gIdx = inSchema.fieldIndex("g")
    val idType = inSchema(idIdx).dataType
    val pType = inSchema(pIdx).dataType
    val gType = inSchema(gIdx).dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      inSchema(idIdx),
      org.apache.spark.sql.types.StructField("p", pType, nullable = false)))
    val dupRdd = sorted.queryExecution.toRdd.mapPartitions { it =>
      val proj =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(outSchema)
      val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      new scala.collection.AbstractIterator[org.apache.spark.sql.catalyst.InternalRow] {
        private var havePrev = false
        private var prevDupLeft = false // prev gram equals its LEFT neighbor's
        private var prevId: Any = null
        private var prevP: Any = null
        private var prevG: Any = null
        private var staged: org.apache.spark.sql.catalyst.InternalRow = null
        private var done = false
        private def cp(v: Any): Any = v match {
          // every buffer-backed VIEW type an UnsafeRow can hand out must
          // be copied, not just UTF8String: duplicateSpans is a public
          // generic operator and a struct/array/map id column would
          // otherwise alias the scanner's reused row buffer across the
          // deferred-by-one emission (corrupted ids). Primitives fall
          // through by value.
          case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
          case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
          case x => x
        }
        private def emitPrev(): Unit = {
          out(0) = prevId; out(1) = prevP
          staged = proj(out)
        }
        private def fetch(): Unit = {
          while (staged == null && !done) {
            if (it.hasNext) {
              val r = it.next()
              val curG = cp(r.get(gIdx, gType))
              val curId = cp(r.get(idIdx, idType))
              val curP = r.get(pIdx, pType)
              if (havePrev) {
                val eq = curG == prevG
                if (prevDupLeft || eq) emitPrev()
                prevDupLeft = eq
              }
              havePrev = true
              prevId = curId; prevP = curP; prevG = curG
            } else {
              if (havePrev && prevDupLeft) emitPrev()
              done = true
            }
          }
        }
        def hasNext: Boolean = { fetch(); staged != null }
        def next(): org.apache.spark.sql.catalyst.InternalRow = {
          fetch()
          if (staged == null) throw new NoSuchElementException
          val r = staged; staged = null; r
        }
      }
    }
    val dup = org.apache.spark.sql.graft.InternalFrame
      .ofRows(docs.sparkSession, dupRdd, outSchema)
      .select(idCol, "p")
    val wDoc = Window.partitionBy(idCol).orderBy("p")
    dup
      .withColumn("prev_end",
        max(col("p") + lit(L - 1)).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_span",
        when(col("prev_end").isNull || col("p") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("span_id",
        sum(col("new_span")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("span_id"))
      .agg(min("p").as("s"), (max("p") + lit(L - 1)).as("e"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + lit(1)).as("dup_chars"))
  }
}
