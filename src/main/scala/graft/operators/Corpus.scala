package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.LineageOps

/** Corpus-management operators for training-data pipelines: reproducible
  * splitting, sequence packing, and eval-set decontamination. No reference
  * analogue (north-star ops, SURVEY.md LLM-pipeline section); all three are
  * oracle-backed (`q_corpus_split`, `q_pack_sequences`, `q_contamination`).
  */
object Corpus {

  /** Deterministic bucket in [0, buckets) from a NON-NEGATIVE numeric id —
    * Knuth multiplicative hashing. Pure integer arithmetic, so any engine
    * (including the SQL oracle, and a future re-run on different hardware)
    * reproduces the assignment bit-for-bit; that reproducibility is the
    * whole point for train/val/test splits. The id is pre-reduced mod 2^31
    * so the multiply can NEVER overflow Long (ANSI mode throws on
    * overflow, and a wrapped product would silently diverge from the
    * oracle) — ids below 2^31 keep their exact historical assignment, ids
    * above hash by their low 31 bits (still uniform; not a crypto hash —
    * use ids, not content, and keep ids non-negative: Spark pmod and SQL %
    * disagree on negative dividends). */
  def idBucket(id: Column, buckets: Int): Column =
    pmod(pmod(id.cast("long"), lit(2147483648L)) * lit(2654435761L), lit(buckets.toLong))

  /** Modulus for ORDERING hashes (epoch shuffle, stratified pick): must be
    * wide, not ppm-sized. With only 10^6 buckets a 10^9-doc corpus gets
    * ~1000 docs per hash value, and the id-ASC tie-break then leaves
    * kilodoc runs of the ORIGINAL ingestion order inside every "shuffled"
    * epoch — 2^31−1 keeps expected tie runs below one doc until corpora
    * pass 2^31. Fraction/split hashes ([[withSplit]],
    * [[applyMixWeights]]) keep their own small moduli: there the bucket
    * IS the semantics (permille / ppm), order does not matter. */
  val OrderHashWidth = 2147483647

  /** Apply [[uniformMixWeights]]-style sampling weights to the corpus:
    * per document, the integer number of copies a weighted epoch would
    * train on — `floor(w/10^6)` whole epochs plus one more iff the doc's
    * id-hash bucket falls under the fractional remainder. Deterministic
    * and append-stable (same Knuth id-hash as [[withSplit]]): a doc's
    * multiplicity never changes as the corpus grows, downsampling
    * (w < 10^6) keeps exactly the hash-selected fraction with
    * `n_copies = 1`, upsampling repeats docs. Callers filter
    * `n_copies > 0` for the sampled corpus; all arithmetic is integer
    * (oracle-exact). The weights side is per-group tiny — broadcast. */
  def applyMixWeights(docs: DataFrame, idCol: String, groupCol: String,
                      weights: DataFrame, weightCol: String = "weight_ppm"): DataFrame =
    docs.join(broadcast(weights.select(col(groupCol), col(weightCol))), groupCol)
      .withColumn("n_copies",
        expr(s"$weightCol div 1000000L") +
          when(idBucket(col(idCol), 1000000) < pmod(col(weightCol), lit(1000000L)), lit(1L))
            .otherwise(lit(0L)))

  /** Canonical form of a URL for dedup keying — web corpora dedup by
    * canonical URL before any content signal. Rules, applied in order:
    *
    *  1. fragment stripped (`#...`);
    *  2. `scheme://host[:port]` prefix lowercased (path/query case kept —
    *     paths are case-sensitive per RFC 3986, hosts are not);
    *  3. leading `www.` dropped from the host;
    *  4. default ports dropped (`:80` for http, `:443` for https);
    *  5. tracking query params removed (`utm_*`, `gclid`, `fbclid`),
    *     including separator repair and a now-empty `?` dropped.
    *
    * Userinfo (`user:pass@`) is case-sensitive per RFC 3986 and passes
    * through verbatim; the www/port rules apply to the host part alone.
    *
    * Pure codegen'd string ops; every regex is RE2-safe (anchors, classes,
    * alternation — no lookaround), so a SQL engine can mirror the chain
    * (the declared oracle goes further and derives expected canonicals
    * independently per flaw variant). Deliberately NOT done:
    * percent-escape normalization, path dot-segment resolution,
    * trailing-slash folding — those require an escape-aware parser and
    * change semantics on real sites. Strings without a `scheme://` prefix
    * pass through rules 1 and 5 only. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    // decompose the authority: userinfo is CASE-SENSITIVE per RFC 3986
    // and must pass through verbatim — only scheme and host[:port]
    // lowercase, and the default-port / www rules apply to the host
    // part alone (an authority-wide regex would stop at the userinfo
    // colon in "u:p@host:80" and miss the port)
    val scheme = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val authority = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val userinfo = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*@)", 1)
    val hostport = substring(authority, length(userinfo) + lit(1), length(authority))
    val schemeL = lower(scheme)
    val hostNoWww = regexp_replace(lower(hostport), "^www\\.", "")
    val hostNoPort = when(schemeL === "http", regexp_replace(hostNoWww, ":80$", ""))
      .when(schemeL === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(hostNoWww)
    val rest = substring(noFrag,
      length(scheme) + lit(3) + length(authority) + lit(1), length(noFrag))
    val rebuilt = when(schemeL === "", noFrag) // not scheme://… — pass through
      .otherwise(concat(schemeL, lit("://"), userinfo, hostNoPort, rest))
    val tracker = "(utm_[a-z0-9]+|gclid|fbclid)"
    // the '&'-variant strip must see ONLY the query: '&' is a legal
    // pchar in paths (RFC 3986 sub-delim), so an unanchored replace
    // would corrupt /a&utm_b=2/c into /a/c and collide two distinct
    // pages' dedup keys. Split at the first '?' (the '?'-anchored
    // variants below are safe by construction).
    val qPos = instr(rebuilt, "?")
    val pathPart = when(qPos === 0, rebuilt)
      .otherwise(rebuilt.substr(lit(1), qPos - lit(1)))
    val queryPart = when(qPos === 0, lit(""))
      .otherwise(rebuilt.substr(qPos, length(rebuilt)))
    val noMid = concat(pathPart,
      regexp_replace(queryPart, s"&$tracker=[^&#]*", ""))
    val noLead = regexp_replace(
      regexp_replace(noMid, s"\\?$tracker=[^&#]*&", "?"),
      s"\\?$tracker=[^&#]*$$", "")
    regexp_replace(noLead, "\\?$", "")
  }

  /** Sliding-window document chunking for fixed-context training: windows
    * of `chunkChars` characters, one starting every `chunkChars −
    * overlapChars` characters (the stride), so consecutive chunks share
    * `overlapChars` of context and no character is ever lost (the last
    * window may run short). Emits one row per (doc, chunk) with
    * `chunk_id`, `n_chunks`, and `chunk_text`; `n_chunks` is carried so
    * downstream packing can budget without re-aggregating. Shape at
    * scale: a pure per-row generator — no shuffle, output inflation
    * bounded by chunk/stride. NULL texts produce no rows (nothing to
    * chunk); an empty string is one empty chunk (a degenerate doc still
    * survives the pass). All arithmetic integer — oracle-exact. */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkChars: Int, overlapChars: Int): DataFrame = {
    require(chunkChars > 0 && overlapChars >= 0 && overlapChars < chunkChars,
      "need 0 <= overlapChars < chunkChars")
    val stride = chunkChars - overlapChars
    docs.filter(col(textCol).isNotNull)
      .withColumn("n_chunks", expr(
        s"""CAST(CASE WHEN length($textCol) <= $chunkChars THEN 1
           | ELSE 1 + (length($textCol) - $chunkChars + ${stride - 1}) div $stride
           | END AS BIGINT)""".stripMargin.replace("\n", " ")))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("chunk_text",
        expr(s"substring($textCol, CAST(chunk_id * $stride AS INT) + 1, $chunkChars)"))
  }

  /** Deterministic stratified sample: up to `n` docs per group, chosen by
    * ranking the group on (Knuth id-hash, id) and keeping the first `n`.
    * The hash order makes the pick uniform over the group yet fully
    * reproducible on any engine (same id-hash as [[withSplit]]); the id
    * tie-break makes it total. Unlike the hash-FRACTION samplers
    * ([[withSplit]], [[applyMixWeights]]) a fixed-COUNT sample cannot be
    * append-stable — a new doc that hashes lower displaces the old rank-n
    * pick by definition. The per-group rank is the grouped range-bucket
    * decomposition ([[Ranks.groupedBucketRange]]): a dominant group never
    * concentrates in one task's sort, whatever the group skew. */
  def stratifiedSample(docs: DataFrame, idCol: String, groupCol: String,
                       n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    val hashed = docs.withColumn("__h", idBucket(col(idCol), OrderHashWidth))
    Ranks.groupedBucketRange(hashed, groupCol,
        Seq(col("__h").asc, col(idCol).asc))
      .withRowNumber("sample_rank")
      .result
      .filter(col("sample_rank") <= n)
      .drop("__h")
  }

  /** Keep the best `keepPpm`/10⁶ fraction of each group by score: rank
    * within the group on (score DESC, id ASC — a total, engine-agnostic
    * order) and keep rank ≤ floor(group_size · keepPpm / 10⁶). The
    * quantile-filter every quality-gated corpus needs when an absolute
    * threshold would starve weak sources: each group keeps its own top
    * fraction. Integer arithmetic throughout (exact for groups up to
    * ~9.2e12 rows). The per-group rank and group totals come from ONE
    * grouped range-bucket pass ([[Ranks.groupedBucketRange]]) — a
    * dominant group (one language = 90% of a web corpus) never sorts in
    * a single task, and the totals are gather literals, not a second
    * window. NULL scores rank behind every non-null score on BOTH
    * engines only if filtered by the caller — filter them out upstream
    * (Spark DESC and SQL DESC disagree on null placement across
    * dialects). */
  def quantileFilter(df: DataFrame, groupCol: String, scoreCol: String,
                     idCol: String, keepPpm: Long): DataFrame = {
    require(keepPpm >= 0 && keepPpm <= 1000000L, "keepPpm must be in [0, 1e6]")
    Ranks.groupedBucketRange(df, groupCol,
        Seq(col(scoreCol).desc, col(idCol).asc))
      .withRowNumber("__rank").withGroupCount("__n").result
      .filter(col("__rank") <= expr(s"(__n * ${keepPpm}L) div 1000000L"))
      .drop("__rank", "__n")
  }

  /** Range-clustered parquet layout: rows are range-partitioned on
    * `clusterCols` into `numFiles` buckets and sorted within each file, so
    * every file owns a disjoint key range and min/max footer pruning skips
    * all but the matching files on a point or range read. The layout step
    * of a 100 TB corpus: a reader's partition pruning is only free if the
    * writer paid for clustering once. (Range partitioning samples the key
    * distribution, so skewed keys still land in balanced files —
    * hash-bucketing would need a separate skew guard.) */
  def writeClustered(df: DataFrame, path: String, numFiles: Int,
                     clusterCols: String*): Unit =
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Keep the single best row per group — max `scoreCol`, ties broken by
    * min `idCol` — and report the group population as `n_group`. The
    * keep-best twin of exact dedup's keep-min: re-crawls of one canonical
    * page (or members of one dedup cluster) collapse to their
    * highest-quality representative instead of the arbitrary first. Rank
    * and count share ONE window shuffle (same partition spec). NULL group
    * keys collapse together per SQL window semantics — pre-filter them
    * when NULL means "unknown", as the dedup-cluster star pass does. */
  def keepBest(df: DataFrame, groupCol: String, scoreCol: String,
               idCol: String): DataFrame = {
    val part = Window.partitionBy(groupCol)
    val ranked = part.orderBy(col(scoreCol).desc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(ranked))
      .withColumn("n_group", count(lit(1)).over(part))
      .filter(col("__rank") === 1)
      .drop("__rank")
  }

  /** Reproducible train/val/test assignment by id bucket (permille
    * fractions). A doc's split NEVER changes as the corpus grows —
    * appending data cannot move old docs across splits (the property
    * random sampling lacks). */
  def withSplit(df: DataFrame, idCol: String,
                trainPermille: Int = 900, valPermille: Int = 50): DataFrame = {
    require(trainPermille + valPermille <= 1000, "fractions exceed 1000 permille")
    val b = idBucket(col(idCol), 1000)
    df.withColumn("split",
      when(b < trainPermille, "train")
        .when(b < trainPermille + valPermille, "val")
        .otherwise("test"))
  }

  /** Greedy streaming sequence packing: within each `partitionCol`, docs in
    * `idCol` order fill fixed `budgetTokens` windows; a doc's pack is the
    * window its FIRST token lands in (cumulative-before div budget). The
    * one-pass streaming approximation of bin packing every
    * tokenize-and-pack job uses at scale: one window cumsum = one shuffle
    * on the partition key, no driver state. Docs longer than the budget
    * still get a pack (they span windows — split downstream at tokenize
    * time). */
  def packSequences(df: DataFrame, partitionCol: String, idCol: String,
                    tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0,
      s"budgetTokens must be positive, got $budgetTokens (0 would fail as " +
        "an ANSI division error deep inside the job)")
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("pack_id",
        expr(s"(__cum - $tokensCol) div $budgetTokens").cast("long"))
      .drop("__cum")
  }

  /** Reproducible per-epoch training order: every row gets a dense
    * 1-based `epoch_rank` — its position in a deterministic shuffle of
    * the corpus — by ranking on (Knuth id-hash, id). The `epoch` number
    * shifts the hash input, so each epoch is a DIFFERENT deterministic
    * permutation of the same corpus (what a trainer's data loader needs:
    * shuffled order, bit-reproducible on any engine, no RNG state to
    * ship). Ranks are positional by definition, so unlike [[withSplit]]
    * they are NOT append-stable — regenerate per corpus snapshot.
    *
    * Scale shape: the same two-level decomposition as [[selectByBudget]]
    * — range-repartition on the order key, per-bucket COUNTS prefix-
    * summed on a `buckets`-row table and broadcast back, within-bucket
    * `row_number` — so the global rank exists without any corpus-sized
    * single-partition sort. Invariant to sampled boundary placement
    * (count decomposition over a fixed total order); bit-identical to
    * the naive global window, which the oracle hash-match proves. */
  def epochOrder(df: DataFrame, idCol: String, epoch: Int = 0,
                 buckets: Int = 0): DataFrame = {
    require(epoch >= 0, "epoch must be non-negative")
    val hashed = df
      .withColumn("__h", idBucket(col(idCol) + lit(epoch.toLong * 1000003L), OrderHashWidth))
    Ranks.bucketRange(hashed, Seq(col("__h").asc, col(idCol).asc), buckets = buckets)
      .withRowNumber("epoch_rank")
      .result.drop("__h")
  }

  /** Deterministic weighted source interleaving — stride scheduling
    * (Waldspurger & Weihl 1995), the order a multi-source data loader
    * actually wants: a source with twice the weight appears twice as
    * densely, uniformly, not in bursts. Each doc gets its per-source
    * shuffle rank `src_rank` (the [[epochOrder]] hash order, restricted
    * to the source) and a virtual time `interleave_key = (src_rank *
    * 10^6) div weight_ppm`; reading in (interleave_key, groupCol,
    * src_rank) order interleaves sources proportionally to weight.
    * Deliberately emits the KEY rather than a global rank: consumers
    * range-partition on it (e.g. [[writeClustered]]) — no global sort,
    * no single-partition stage anywhere; the only shuffle is the
    * per-source rank window, and the weights side is per-group tiny —
    * broadcast. All integer arithmetic; a different `epoch` reshuffles
    * within every source. */
  def interleaveOrder(docs: DataFrame, idCol: String, groupCol: String,
                      weights: DataFrame, weightCol: String = "weight_ppm",
                      epoch: Int = 0): DataFrame = {
    require(epoch >= 0, "epoch must be non-negative")
    // per-source shuffle rank via the grouped decomposition: sources are
    // few and corpus-sized — exactly the skew a partitionBy(source)
    // window would concentrate into one task per source
    val hashed = docs
      .withColumn("__h", idBucket(col(idCol) + lit(epoch.toLong * 1000003L), OrderHashWidth))
    Ranks.groupedBucketRange(hashed, groupCol,
        Seq(col("__h").asc, col(idCol).asc))
      .withRowNumber("src_rank")
      .result
      .drop("__h")
      .join(broadcast(weights.select(col(groupCol), col(weightCol))), groupCol)
      .withColumn("interleave_key",
        expr(s"(src_rank * 1000000L) div greatest($weightCol, 1L)"))
  }

  /** Systematic probability-proportional-to-size sampling: lay every
    * row's `sizeCol` mass end to end in `idCol` order, then take every
    * `step = max(total div n, 1)`-th position starting at `step div 2` —
    * each row is drawn with probability proportional to its size, big
    * rows can be drawn multiple times (`multiplicity`), and the whole
    * draw is EXACT integer arithmetic: deterministic for a given corpus
    * on any engine, and oracle-provable (unlike hash-exponential
    * weighted reservoirs, which are float territory). A fixed-n draw
    * necessarily changes when the corpus grows (step = total/n); for an
    * append-stable sample use [[graft.functions.BottomKByKey]] instead.
    * This is the survey-sampling way to pull a token-mass-balanced audit
    * sample from a 100 TB corpus: one cumulative-sum pass, no RNG.
    *
    * Scale shape: the same two-level cumsum decomposition as
    * [[selectByBudget]] — range-partition by id, per-bucket totals give
    * broadcast prefix offsets, the in-bucket window never leaves its
    * partition; the driver never sees a row.
    *
    * Returns rows with `multiplicity >= 1` plus their `cum_start`.
    * Σ multiplicity = number of sample positions under the total mass
    * (== n up to the flooring of step; PpsSampleSpec pins conservation).
    */
  def ppsSample(df: DataFrame, idCol: String, sizeCol: String, n: Long,
                buckets: Int = 0): DataFrame = {
    require(n > 0, "need a positive sample size")
    val sized = df.filter(col(sizeCol).isNotNull && col(sizeCol) > 0)
    val b = Ranks.bucketRange(sized, Seq(col(idCol).asc),
      valueCols = Seq(sizeCol), buckets = buckets)
    // step falls out of the same bounded bucket gather as a literal
    val step = math.max(b.valueTotal(sizeCol) / n, 1L)
    // positions hit in [cum_start, cum_end): f(end) - f(start) where
    // f(x) = #{k >= 0 : off + k*step < x}; off = step div 2
    def hitsBelow(x: String) =
      s"CASE WHEN $x <= ${step / 2}L THEN 0L ELSE ($x - 1 - ${step / 2}L) div ${step}L + 1 END"
    b.withCumSum(sizeCol, "cum_end").result
      .withColumn("cum_start", col("cum_end") - col(sizeCol))
      .withColumn("multiplicity",
        expr(s"${hitsBelow("cum_end")} - ${hitsBelow("cum_start")}"))
      .filter(col("multiplicity") > 0)
  }

  /** Token-budget selection: keep the best documents by `scoreCol` (ties
    * broken by `idCol` — a total, engine-agnostic order) until their
    * cumulative token count fills `budgetTokens`. A doc is selected iff
    * its FIRST token lands inside the budget (`cum_before < budget`, the
    * [[packSequences]] convention), so the last selected doc may overrun
    * the boundary — a budget is a target, not a guillotine that splits a
    * document. Emits `cum_tokens` (running total through the doc) so the
    * caller can see the fill level.
    *
    * Scale shape — the whole point of this operator: a global running
    * sum is ONE `Window.orderBy` away, but that plans a single-partition
    * sort (the classic 100 TB trap: one task sorts the corpus). Instead,
    * a two-level decomposition with no global sort anywhere:
    *
    *  1. range-repartition on (score DESC, id ASC) into `buckets`
    *     partitions — sampled boundaries, so skewed scores still land in
    *     balanced buckets, and every bucket owns a contiguous slice of
    *     the total order;
    *  2. per-bucket token totals (tiny: `buckets` rows) come to the
    *     driver (bounded gather) and return as a literal prefix-map
    *     projection — see [[Ranks]], which owns the implementation;
    *  3. a within-bucket running sum (hash-partitioned window — each
    *     bucket sorts independently) plus the bucket's prefix is the
    *     exact global running sum.
    *
    * The decomposition is invariant to WHERE the sampled boundaries fall
    * (associativity of + over a fixed total order), so results are
    * bit-identical to the naive single-partition window — the oracle and
    * BudgetSelectSpec both pin that. `spark_partition_id()` is stable
    * under task retry (a re-run recomputes the same partition) and only
    * ever feeds same-stage bookkeeping here, never a cross-run contract. */
  def selectByBudget(df: DataFrame, idCol: String, scoreCol: String,
                     tokensCol: String, budgetTokens: Long,
                     buckets: Int = 0): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    Ranks.bucketRange(df, Seq(col(scoreCol).desc, col(idCol).asc),
        valueCols = Seq(tokensCol), buckets = buckets)
      .withCumSum(tokensCol, "cum_tokens")
      .result
      .filter(col("cum_tokens") - col(tokensCol) < budgetTokens)
  }

  /** Data-mixing weights: given per-group token totals, the sampling
    * weight (floor-scaled ppm) that moves each group toward a UNIFORM
    * share of the corpus token budget — weight > 1e6 means upsample,
    * < 1e6 downsample, clamped to `maxUpsamplePpm` (no real pipeline
    * upsamples one group a million-fold; the default caps at 1000×).
    * Pure integer arithmetic end to end, so the mix is reproducible on
    * any engine; zero-token groups read as 1 token instead of dividing
    * by zero. Overflow-free under ANSI for EVERY BIGINT input, by
    * construction rather than by assumption:
    *  - the ppm is decomposed `floor(T*1e6/g) = (T div g)*1e6 +
    *    ((T mod g)*1e6) div g` (a naive `T*1e6` throws past ~9.2e12
    *    target tokens);
    *  - the integral term is clamped BEFORE the multiply — the CASE
    *    guard on `T div g` is what makes the clamp safe, since a
    *    `least()` around the product would still evaluate it;
    *  - the fractional term shift-scales both operands by 2^20 once the
    *    group exceeds ~9.2e12 tokens (where `(T mod g)*1e6` could no
    *    longer fit a Long) — ≤ 2.4e-7 relative error on a sub-ppm digit,
    *    still deterministic integer arithmetic on any engine.
    * The totals side is one broadcast row; the whole computation is two
    * aggregates. */
  def uniformMixWeights(perGroupTokens: DataFrame,
                        groupCol: String, tokensCol: String,
                        maxUpsamplePpm: Long = 1000000000L): DataFrame = {
    require(maxUpsamplePpm >= 1000000L && maxUpsamplePpm <= Long.MaxValue - 1000000L,
      "maxUpsamplePpm must be in [1e6, Long.MaxValue - 1e6]")
    val t = perGroupTokens.agg(
      sum(col(tokensCol)).as("__total"), count(lit(1)).as("__n"))
    val g = s"greatest($tokensCol, 1L)"
    val q = s"((__total div __n) div $g)" // integral target/g; remainder < g
    val r = s"((__total div __n) % $g)"
    val frac =
      s"""CASE WHEN $g > ${Long.MaxValue / 1000000L}L
         | THEN (($r div 1048576L) * 1000000L) div ($g div 1048576L)
         | ELSE ($r * 1000000L) div $g END""".stripMargin.replace("\n", " ")
    val weight =
      s"""CASE WHEN $q > ${maxUpsamplePpm / 1000000L}L THEN ${maxUpsamplePpm}L
         | ELSE least($q * 1000000L + $frac, ${maxUpsamplePpm}L) END""".stripMargin
        .replace("\n", " ")
    perGroupTokens.crossJoin(broadcast(t))
      .select(col(groupCol), col(tokensCol), expr(weight).as("weight_ppm"))
  }

  /** Snapshot diff — the ingest diagnostic run between two crawls of the
    * same corpus: per (group, status) counts of added / removed / changed
    * / unchanged docs, change detected by content digest. NULL digests
    * (null text) on both sides compare as CHANGED — unknown content is
    * never assumed stable (SQL equality semantics, mirrored by the
    * oracle's CASE).
    *
    * Scale shape: both snapshots reduce to slim (id, group, digest)
    * projections BEFORE the full-outer equi-join on the id — the only
    * corpus-sized shuffle carries ~50 bytes/row; the status projection
    * and the (group, status) aggregate are map-side-combinable. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String, groupCol: String): DataFrame = {
    // presence is an explicit marker, NOT id-nullness: a NULL-id row never
    // matches the equi-join, and inferring absence from its own null id
    // would classify an old-snapshot NULL-id doc as "added" (its __ido is
    // null by identity) — with markers it reads correctly as removed, and
    // a NULL-id pair surfaces as one removed + one added (no silent merge)
    val o = oldSnap.select(col(idCol).as("__ido"), col(groupCol).as("__go"),
      md5(col(textCol).cast("binary")).as("__do"), lit(true).as("__po"))
    val n = newSnap.select(col(idCol).as("__idn"), col(groupCol).as("__gn"),
      md5(col(textCol).cast("binary")).as("__dn"), lit(true).as("__pn"))
    val status = when(col("__po").isNull, "added")
      .when(col("__pn").isNull, "removed")
      .when(col("__do") === col("__dn"), "unchanged")
      .otherwise("changed")
    o.join(n, col("__ido") === col("__idn"), "full_outer")
      .select(coalesce(col("__gn"), col("__go")).as(groupCol), status.as("status"))
      .groupBy(groupCol, "status").agg(count(lit(1)).as("n_docs"))
  }

  /** Eval-set decontamination: for every train doc, the number of distinct
    * k-char shingles it shares with ANY eval doc (0-row absence = clean).
    * The eval side's distinct shingle set is broadcast — eval corpora are
    * small by construction, so the train side stays a map-side hash
    * semi-lookup at 100 TB: explode distinct shingles, broadcast-join,
    * per-doc count; no shuffle of train text. */
  def contamination(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String, k: Int): DataFrame =
    contaminationTail(train, distinctEvalGrams(eval, textCol, k),
      idCol, textCol, k, prefilter = None)

  /** The distinct eval gram set both decontamination variants consume. */
  private def distinctEvalGrams(eval: DataFrame, textCol: String, k: Int): DataFrame =
    eval.select(explode(TextAnalysis.shingles(col(textCol), k)).as("g")).distinct()

  /** Shared second half of [[contamination]]/[[contaminationBloom]]:
    * explode train grams (optionally gated by a cheap prefilter), verify
    * against the broadcast eval set, count per doc. One body so the two
    * variants can never drift — the Bloom doc PROMISES row-identical
    * results. */
  private def contaminationTail(train: DataFrame, evalGrams: DataFrame,
                                idCol: String, textCol: String, k: Int,
                                prefilter: Option[Column]): DataFrame = {
    val grams = train
      .select(col(idCol), explode(TextAnalysis.shingles(col(textCol), k)).as("g"))
    prefilter.fold(grams)(grams.filter)
      .join(broadcast(evalGrams), "g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** [[contamination]] with a Bloom-filter prefilter on the train side —
    * the runtime-filter shape for 100 TB: even with the eval gram set
    * broadcast, the exact path probes a multi-million-entry hash relation
    * once PER TRAIN GRAM; here a few-hundred-KB bit table (built from the
    * eval grams in one tiny aggregate, carried in the plan) rejects almost
    * every train gram with two xxhash64 evaluations FIRST, and only the
    * survivors (true overlaps + the ~0.2% false positives) reach the
    * broadcast verify join. False negatives are impossible — build and
    * probe share one probe-position formula ([[graft.functions.BloomKernels]])
    * — and false positives are removed by the exact join, so the result
    * EQUALS [[contamination]] row-for-row (one oracle serves both).
    *
    * `bits` must be a power of two; size it ~16× the expected distinct
    * eval gram count for ~0.2% fpp at `hashes` = 4. */
  def contaminationBloom(train: DataFrame, eval: DataFrame,
                         idCol: String, textCol: String, k: Int,
                         bits: Int = 1 << 21, hashes: Int = 4): DataFrame = {
    import graft.functions.{BloomKernels, BloomMightContain, BloomPositions}
    // eval grams feed the filter build AND the verify join: materialize
    // once (the clean()/connectedComponents checkpoint discipline)
    val evalGrams = distinctEvalGrams(eval, textCol, k).lineageCut()
    val words = BloomKernels.emptyWords(bits, hashes)
    evalGrams
      .select(explode(BloomPositions(col("g"), bits, hashes)).as("p"))
      .groupBy(shiftright(col("p"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), p % 64))").as("m"))
      .collect() // bits/64 rows max — a bounded driver gather, like IVF centroids
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    contaminationTail(train, evalGrams, idCol, textCol, k,
      prefilter = Some(BloomMightContain(col("g"), words, hashes)))
  }

  /** Provenance attribution — [[contamination]]'s per-PAIR refinement:
    * for every eval doc, the `topK` train docs sharing the most distinct
    * RARE k-char shingles (which training documents "explain" an eval
    * answer — the question a leakage audit asks AFTER the binary flag
    * fires). Grams in more than `maxEvalDf` eval docs are dropped BEFORE
    * the join: a ubiquitous gram carries no attribution signal, and it is
    * also the scale hazard — each matching train gram row fans out one
    * pair row PER eval doc carrying the gram (the hot-LSH-bucket problem
    * in gram form; unbounded, this measured 6-7 s vs 1.5 s at sf0.1).
    * With the cap, pair fan-out is ≤ maxEvalDf per train gram and the
    * pair aggregate is bounded by true rare overlaps. The per-eval head
    * is a row_number window on the already-reduced pair table.
    */
  def provenance(train: DataFrame, eval: DataFrame,
                 idCol: String, textCol: String,
                 k: Int, topK: Int, maxEvalDf: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = eval.select(col(idCol).as("eval_id"),
      explode(TextAnalysis.shingles(col(textCol), k)).as("g"))
    val rare = e.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxEvalDf).select("g")
    val eRare = e.join(rare, "g")
    val t = train.select(col(idCol).as("train_id"),
      explode(TextAnalysis.shingles(col(textCol), k)).as("g"))
    val w = Window.partitionBy("eval_id")
      .orderBy(col("n_shared_grams").desc, col("train_id"))
    t.join(broadcast(eRare), "g")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
  }
}
