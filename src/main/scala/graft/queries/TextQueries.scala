package graft.queries

import graft.Tables
import graft.functions.{AudioMeta, ImageMeta, KmvDistinctEstimate, KmvJaccardPpm, KmvSketch, VideoMeta}
import graft.operators.{Corpus, Dedup, Multimodal, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Lineage.LineageOps

/** Text-analysis / dedup / multimodal queries over the `documents` table
  * (north-star pipeline operators). Hash-based candidates (MinHash, SimHash)
  * are rows-only checked (xxhash64 is not reproducible in DuckDB); their
  * correctness is covered by scalatest specs against exact Jaccard /
  * Hamming truth.
  */
object TextQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Deterministic 4-way media-mix payload (PNG / WAV / MP4 / "TXT:"-tagged
    * raw text by doc_id % 4) — shared by q_media_route and
    * q_media_quality so both oracles derive from ONE synthesis rule. */
  private def mediaMixPayload: org.apache.spark.sql.Column = {
      val id = col("doc_id")
      val kind = pmod(id, lit(4))
      val w = (lit(16) + pmod(id, lit(2048))).cast("int")
      val h = (lit(16) + pmod(id * 31, lit(1536))).cast("int")
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000"))
      // canonical 8 kHz mono 8-bit PCM (byte rate 8000)
      val dataBytes = pmod((id + 1) * 977, lit(100000)).cast("long")
      def le32(x: org.apache.spark.sql.Column) = {
        val hx = lpad(hex(x), 8, "0")
        concat(substring(hx, 7, 2), substring(hx, 5, 2),
          substring(hx, 3, 2), substring(hx, 1, 2))
      }
      val wavHex = concat(
        lit("524946460000000057415645" + "666D742010000000" +
          "01000100401F0000401F000001000800" + "64617461"), le32(dataBytes))
      // MP4 v0 with the same dims as the PNG branch, timescale 1000
      val dur = pmod((id + 1) * 471, lit(7200000)).cast("long")
      def zeros(n: Int) = "0" * n
      val matrix = "00010000" + zeros(24) + "00010000" + zeros(24) + "40000000"
      val mp4Hex = concat(
        lit("000000106674797069736F6D00000000" + "000000D86D6F6F76" +
          "0000006C6D76686400000000" + zeros(16) + "000003E8"),
        lpad(hex(dur), 8, "0"),
        lit("00010000" + "01000000" + zeros(16) + matrix + zeros(48) + "00000002" +
          "000000647472616B" +
          "0000005C746B686400000003" + zeros(16) + "00000001" + zeros(48) + matrix),
        lpad(hex(w), 4, "0"), lit("0000"), lpad(hex(h), 4, "0"), lit("0000"))
      val payload = when(kind === 0, unhex(pngHex))
        .when(kind === 1, unhex(wavHex))
        .when(kind === 2, unhex(mp4Hex))
        .otherwise(concat(lit("TXT:"), col("text")).cast("binary"))
      payload
  }


  val queries: Map[String, Q] = Map(
    // Per-doc structural stats — stays in one codegen'd projection.
    "q_doc_stats" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_calc"),
        TA.tokenCount(col("text")).as("n_tokens"),
        TA.bpeTokenCount(col("text")).as("n_tokens_bpe"),
        TA.punctCount(col("text")).as("n_punct"))
        .orderBy("doc_id")
    },

    // Quality scoring (floor-scaled ppm for engine-exact compare).
    "q_quality" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), TA.qualityScorePpm(col("text")).as("quality_ppm"))
        .orderBy("doc_id")
    },

    // Stopword-profile language ID.
    "q_langid" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"), TA.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    // Label-vs-predictor consistency audit: the confusion matrix between
    // the shipped `lang` label and the engine's language-ID — the check
    // a pipeline runs before TRUSTING either signal for filtering. Same
    // predictor as q_langid (oracle reuses its proven CTE), reduced to
    // the matrix grain with per-label mismatch ppm.
    "q_lang_confusion" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("lang"), TA.langId(col("text")).as("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
        .withColumn("label_total",
          expr("CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)"))
        .withColumn("cell_ppm", expr("n * 1000000 div label_total"))
        .orderBy("lang", "lang_pred")
    },

    // Corpus token accounting per source (pre-training data budgeting).
    "q_token_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TA.bpeTokenCount(col("text"))).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("source")
    },

    // Degenerate-text signal: most-repeated-trigram share per doc.
    "q_repetition" -> { (s, dir) =>
      TA.repetitionPpm(Tables(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id")
    },

    // Vocabulary head: top-100 tokens by occurrences (df + tf per token) —
    // the IDF/vocab building block. Total order (n_occurrences, n_docs,
    // token) makes the top-100 cut deterministic on both engines.
    "q_vocab" -> { (s, dir) =>
      TA.termCounts(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("n_occurrences").desc, col("n_docs").desc, col("token"))
        .limit(100)
    },

    // Token-frequency drift between two crawls — the report a corpus
    // owner reads BEFORE retraining on a refreshed snapshot: which
    // tokens gained/lost corpus share. Snapshots synthesized by doc-id
    // parity (media-header discipline: deterministic, mirrored by the
    // oracle); minCount bounds the report to tokens with real mass.
    "q_token_drift" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      TA.termDrift(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "text", minCount = 50L)
        .orderBy("token")
    },

    // Heavy hitters without a vocabulary shuffle: the mergeable
    // Misra-Gries summary (capacity 256) collapses the token stream
    // map-side and ships O(k) bytes per partition; the declared head-20
    // is deep inside the capacity so it is stable and equals the exact
    // top tokens on this corpus (HeavyHittersSpec pins the bounds).
    // Rows-only: a partition-order-dependent sketch tail is not
    // SQL-expressible (the HLL precedent).
    "q_heavy_hitters" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("w"))
        .agg(graft.functions.MisraGries(col("w"), 256).as("__hh"))
        .select(explode(col("__hh")).as("e"))
        .select(col("e.token").as("token"), col("e.est_count").as("est_count"))
        .orderBy(col("est_count").desc, col("token"))
        .limit(20)
    },

    // Frequency BRACKET for the head tokens in one pass of each sketch:
    // Misra-Gries guarantees an UNDERcount, Count-Min (built-in
    // count_min_sketch aggregate + the graft cms_probe read expression)
    // guarantees an OVERcount — so [mg_est, cms_est] provably contains
    // the true corpus frequency without ever shuffling the token stream
    // (both sketches collapse map-side; the 1-row sketch broadcasts to
    // the 20-row head). Rows-only per the sketch discipline; CmsProbeSpec
    // pins the bracket on an exact fixture.
    "q_cms_terms" -> { (s, dir) =>
      val words = Tables(s, dir, "documents")
        .select(explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("w"))
      val cms = words.agg(
        count_min_sketch(col("w"), lit(0.0001d), lit(0.99d), lit(42)).as("sk"))
      words
        .agg(graft.functions.MisraGries(col("w"), 256).as("__hh"))
        .select(explode(col("__hh")).as("e"))
        .select(col("e.token").as("token"), col("e.est_count").as("mg_est"))
        .orderBy(col("mg_est").desc, col("token"))
        .limit(20)
        .crossJoin(broadcast(cms))
        .select(col("token"), col("mg_est"),
          graft.functions.CmsProbe(col("sk"), col("token")).as("cms_est"))
        .orderBy(col("cms_est").desc, col("token"))
    },

    // Positional phrase search ("hash join" as an ADJACENT token pair) —
    // the retrieval operator BM25/keyword search cannot express: term
    // order matters. Tokens carry positions (posexplode), adjacency is a
    // lead window over ONE doc exchange — never a positional self-join,
    // so the cost is linear in token count. Per-doc hit count + first
    // hit position (1-based, matching the oracle's subscripts).
    "q_phrase_search" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w"))
        .withColumn("nxt", lead("w", 1).over(w))
        .filter(col("w") === "hash" && col("nxt") === "join")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"), min("pos").cast("long").as("first_pos"))
        .orderBy("doc_id")
    },

    // Per-source document-length quantiles without a value shuffle: the
    // mergeable deterministic KLL summary (capacity 256) sketches each
    // source's n_chars distribution map-side; the exchange carries a few
    // KB per partition instead of the length column. Rows-only: sketch
    // estimates are not SQL-expressible (the MisraGries/HLL precedent);
    // QuantileSketchSpec pins exactness below capacity and the rank-error
    // bound above it.
    "q_quantile_sketch" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), col("n_chars"))
        .groupBy("source")
        .agg(graft.functions.KllQuantiles(
          col("n_chars"), 256, Seq(0.25, 0.5, 0.75, 0.9, 0.99)).as("__qs"))
        .select(col("source"), explode(col("__qs")).as("e"))
        .select(col("source"), col("e.q").as("q"), col("e.est").as("est_len"))
        .orderBy("source", "q")
    },

    // Exact duplicate-SPAN report — the substring-level dedup signal
    // (dedup at the span grain, the "Deduplicating Training Data Makes
    // Language Models Better" regime; Lee et al. 2022): every 50-char
    // gram occurring more than once in the corpus marks its positions,
    // per-doc positions merge into maximal spans, each doc reports how
    // many duplicated spans it carries and how many chars they cover.
    // Linear in corpus size (one gram per position — never pairwise):
    // the gram shuffle carries (md5, doc, pos); the span merge is the
    // interval-merge window (running max end) on the doc partition.
    "q_substring_dup" -> { (s, dir) =>
      TA.duplicateSpans(Tables(s, dir, "documents"), "doc_id", "text",
        L = 50, exact = true)
        .orderBy("doc_id")
    },

    // Production path of the span signal: the one-pass GramDigests kernel
    // (xxhash64 over byte-addressed char grams — no per-gram substring
    // materialization, no md5, 8-byte shuffle key). Rows-only per the
    // xxhash discipline; SpanKernelsSpec pins bit-identical output vs the
    // exact path on this corpus.
    "q_substring_dup_fast" -> { (s, dir) =>
      TA.duplicateSpans(Tables(s, dir, "documents"), "doc_id", "text",
        L = 50, exact = false)
        .orderBy("doc_id")
    },

    // Reproducible per-source sample without a corpus shuffle: the k
    // smallest xxhash64(doc_id) per source (bottom-k / KMV) are a
    // deterministic uniform sample whose membership is independent of
    // partitioning and merge order — the property audit sampling and
    // eval-set carving need. The exchange ships k pairs per partition
    // per source, never the corpus. Rows-only per the xxhash64
    // discipline; BottomKSpec pins exactness against the sort path.
    "q_sample_bottomk" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"))
        .groupBy("source")
        .agg(graft.functions.BottomKByKey(
          xxhash64(col("doc_id")), col("doc_id"), 10).as("__s"))
        .select(col("source"), explode(col("__s")).as("e"))
        .select(col("source"), col("e.sort_key").as("sort_key"),
          col("e.id").as("doc_id"))
        .orderBy("source", "sort_key")
    },

    // Inverted-index shard build — the retrieval-side artifact (BM25/
    // keyword search read postings, something must WRITE them): per term
    // the document frequency and a bounded head of the doc-id postings
    // list. The head is row_number-bounded BEFORE collection so no task
    // ever materializes a full postings list; window + final agg share
    // the term exchange. The term->string join casts the sorted long
    // array (codegen'd cast, no per-element HOF). Declared head = top
    // 200 terms by df — bounded output by construction.
    "q_postings" -> { (s, dir) =>
      val pairs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("token"))
        .filter(length(col("token")) >= 3)
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("token").orderBy("doc_id")
      pairs.withColumn("rn", row_number().over(w))
        .groupBy("token")
        .agg(count(lit(1)).as("df"),
          array_join(
            sort_array(collect_list(when(col("rn") <= 20, col("doc_id"))))
              .cast("array<string>"), ",").as("postings_head"))
        .orderBy(col("df").desc, col("token"))
        .limit(200)
    },

    // Characteristic vocabulary per source — log-free tf·idf (integer
    // reciprocal-df, the q_keyword_search weighting over the WHOLE vocab)
    // so the ranking is engine-exact; the report every mix-design pass
    // reads to see what distinguishes each corpus slice.
    "q_tfidf_terms" -> { (s, dir) =>
      TA.tfIdfTopTerms(Tables(s, dir, "documents"), "doc_id", "text",
        "source", minLen = 3, k = 10)
        .orderBy("source", "rnk")
    },

    // Sentence segmentation stats — mean sentence length is a classic
    // fluency/quality signal (spam and tables segment degenerately).
    // Sentence count = terminator runs ([.!?]+) so "..." counts once;
    // docs with no terminator count as one sentence. Pure projection.
    "q_sentence_stats" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("__chars"),
          size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
            .cast("long").as("__t"))
        .select(col("doc_id"),
          greatest(col("__t"), lit(1L)).as("n_sentences"),
          expr("__chars div greatest(__t, 1L)").as("chars_per_sentence"))
        .orderBy("doc_id")
    },

    // Inter-source vocabulary overlap matrix — the redundancy diagnostic a
    // mix design reads next to tf-idf: how much of each pair of corpus
    // slices is the same vocabulary. The (source, token) vocab table is
    // pinned behind one token exchange so the self-join's two sides and
    // the size aggregate share a single compute; pair fan-out per token is
    // bounded by sources², never corpus-sized.
    "q_source_overlap" -> { (s, dir) =>
      val v = Tables(s, dir, "documents")
        .select(col("source"),
          explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("token"))
        .filter(length(col("token")) >= 3)
        .distinct()
        .repartition(col("token"))
      val sizes = v.groupBy("source").agg(count(lit(1)).as("n"))
      v.as("a").join(v.as("b"),
          col("a.token") === col("b.token") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(sizes.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"), col("n_b"),
          expr("(n_shared * 1000000) div (n_a + n_b - n_shared)").as("jacc_ppm"))
        .orderBy("src_a", "src_b")
    },

    // Reproducible train/val/test split (id-hash buckets: append-stable,
    // engine-independent) — data-budget report per (source, split).
    "q_corpus_split" -> { (s, dir) =>
      Corpus.withSplit(Tables(s, dir, "documents"), "doc_id")
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("source", "split")
    },

    // Train→holdout leakage audit (the split-integrity check run before
    // any eval number is believed): per holdout split, docs whose EXACT
    // content digest also appears in train, with leaked char mass and
    // ppm. Scale shape: one slim (split, digest, chars) projection; the
    // train side reduces to DISTINCT digests before the semi-join, so
    // text never shuffles and the join key is 32 bytes/doc.
    "q_split_leakage" -> { (s, dir) =>
      val d = Corpus.withSplit(
          Tables(s, dir, "documents").filter(col("text").isNotNull), "doc_id")
        .select(col("split"), md5(col("text").cast("binary")).as("digest"),
          length(col("text")).cast("long").as("n_chars"))
      val train = d.filter(col("split") === "train").select("digest").distinct()
      val holdout = d.filter(col("split") =!= "train")
      val leaked = holdout.join(train, Seq("digest"), "left_semi")
        .groupBy("split")
        .agg(count(lit(1)).as("n_leaked"),
          expr("CAST(SUM(n_chars) AS BIGINT)").as("leaked_chars"))
      holdout.groupBy("split").agg(count(lit(1)).as("n_docs"))
        .join(leaked, Seq("split"), "left")
        .selectExpr("split", "n_docs",
          "coalesce(n_leaked, 0L) AS n_leaked",
          "coalesce(leaked_chars, 0L) AS leaked_chars",
          "coalesce(n_leaked, 0L) * 1000000 div n_docs AS leak_ppm")
        .orderBy("split")
    },

    // Reproducible epoch-1 training order: a deterministic shuffle
    // permutation as dense global ranks — assigned by the two-level
    // range-bucket decomposition (no single-partition corpus sort);
    // must equal the oracle's single global ROW_NUMBER exactly.
    "q_epoch_order" -> { (s, dir) =>
      Corpus.epochOrder(Tables(s, dir, "documents").select("doc_id"),
        "doc_id", epoch = 1, buckets = 32)
        .orderBy("doc_id")
    },

    // Weighted source interleaving (stride scheduling): per-source
    // shuffle ranks + integer virtual time; reading in interleave_key
    // order mixes sources proportionally to weight with no global sort.
    // Weights synthesized deterministically from the source name
    // (media-header discipline), epoch 1.
    "q_interleave_order" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents").select("doc_id", "source")
      val weights = docs.select("source").distinct()
        .withColumn("weight_ppm",
          expr("(1 + length(source) % 3) * 1000000L"))
      Corpus.interleaveOrder(docs, "doc_id", "source", weights, epoch = 1)
        .select("doc_id", "source", "src_rank", "interleave_key")
        .orderBy("doc_id")
    },

    // Loader shard manifest: the epoch-1 permutation striped round-robin
    // into 8 data-loader shards — per shard, its doc and token mass (the
    // balance proof a multi-host trainer reads before launching).
    // Composition of the proven epochOrder ranks + one slim aggregate.
    "q_shard_manifest" -> { (s, dir) =>
      val withTok = Tables(s, dir, "documents")
        .select(col("doc_id"), TA.bpeTokenCount(col("text")).as("n_tokens"))
      Corpus.epochOrder(withTok, "doc_id", epoch = 1, buckets = 32)
        .withColumn("shard", pmod(col("epoch_rank") - 1, lit(8)).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
        .orderBy("shard")
    },

    // Streaming sequence packing: per-source docs in id order fill
    // 512-token windows (one window cumsum = one shuffle on source).
    "q_pack_sequences" -> { (s, dir) =>
      val withTok = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.bpeTokenCount(col("text")).as("n_tokens"))
      Corpus.packSequences(withTok, "source", "doc_id", "n_tokens", 512L)
        .orderBy("doc_id")
    },

    // Pack manifest: the contents of each training pack (which docs, how
    // many tokens) — what the trainer's data loader actually consumes.
    // Doc identity travels as a zero-padded id list so BOTH engines sort
    // it identically as strings (no higher-order functions).
    "q_pack_manifest" -> { (s, dir) =>
      val withTok = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.bpeTokenCount(col("text")).as("n_tokens"))
      Corpus.packSequences(withTok, "source", "doc_id", "n_tokens", 512L)
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("pack_tokens"),
          concat_ws(",", sort_array(collect_list(
            lpad(col("doc_id").cast("string"), 6, "0")))).as("ids"))
        .orderBy("source", "pack_id")
    },

    // Pack-boundary spill report: the streaming packer is DENSE (a doc's
    // pack is where its first token lands, so there is no padding by
    // construction) — the cost it does pay is docs CROSSING window
    // boundaries, which a trainer truncates or fragments. Per source:
    // spanning docs and the tokens past their first 512-boundary, as ppm
    // of the token mass — the number that says whether the budget is too
    // small for the corpus's document lengths.
    "q_pack_spill" -> { (s, dir) =>
      // per-source running token total via the GROUPED range-bucket
      // decomposition (graft.operators.Ranks): sources are few and
      // corpus-sized, so a partitionBy(source) window would sort each
      // source's full doc stream in one task
      val toks = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TA.bpeTokenCount(col("text")).as("n"))
      graft.operators.Ranks
        .groupedBucketRange(toks, "source", Seq(col("doc_id").asc),
          valueCols = Seq("n"))
        .withCumSum("n", "cum")
        .result
        .withColumn("sp", expr("(cum - n) div 512"))
        .withColumn("ep", expr("CASE WHEN n > 0 THEN (cum - 1) div 512 ELSE (cum - n) div 512 END"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("ep") > col("sp"), 1L).otherwise(0L)).as("n_spanning_docs"),
          sum(when(col("ep") > col("sp"), col("cum") - (col("sp") + 1) * 512)
            .otherwise(0L)).as("spilled_tokens"),
          sum("n").as("__tok"))
        .select(col("source"), col("n_docs"), col("n_spanning_docs"),
          col("spilled_tokens"),
          expr("(spilled_tokens * 1000000) div greatest(__tok, 1L)").as("spill_ppm"))
        .orderBy("source")
    },

    // Char-length histogram per source (floor-of-100 buckets) — the
    // distribution profile every corpus intake report starts with.
    "q_length_histogram" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("source"),
          expr("length(text) div 100").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .orderBy("source", "bucket")
    },

    // The whole preprocessing pass as ONE declarative plan — quality
    // filter → language filter → exact-dedup keep-min → reproducible split
    // → per-(split, lang) token budget. Catalyst fuses the scoring into
    // the scan projection; the only shuffles are the dedup group and the
    // final budget aggregate. Composability is the point: each stage is an
    // already-oracle-proven operator.
    "q_pipeline_e2e" -> { (s, dir) =>
      // eagerly checkpointed: the scoring projection is the expensive
      // stage (a large codegen'd method over many string ops) and BOTH
      // sides of the keep-join consume it — compute it once. A local
      // checkpoint (the connectedComponents discipline) owns its blocks
      // and frees them with the reference, unlike the previous persist(),
      // which pinned a corpus-sized cache entry for the whole session
      // because the lazy output's lineage held it. On a cluster swap for
      // checkpoint() to survive executor loss.
      val scored = Tables(s, dir, "documents").select(
        col("doc_id"),
        TA.qualityScorePpm(col("text")).as("q"),
        TA.langId(col("text")).as("lang_pred"),
        TA.bpeTokenCount(col("text")).as("n_tokens"),
        md5(col("text").cast("binary")).as("digest"))
        .lineageCut()
      val filtered = scored.filter(col("q") >= 400000L && col("lang_pred") =!= "und")
      // keep is per-DISTINCT-DIGEST (corpus-sized): hash-build the
      // keep-join, never broadcast (q_lm_score hazard class)
      val keep = filtered.groupBy("digest").agg(min("doc_id").as("doc_id"))
      val kept = filtered.join(keep.hint("shuffle_hash"), Seq("digest", "doc_id"))
      Corpus.withSplit(kept, "doc_id")
        .groupBy("split", "lang_pred")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .orderBy("split", "lang_pred")
    },

    // Data mixing: per-source sampling weight toward a uniform token
    // budget (ppm; >1e6 upsample, <1e6 downsample) — integer-exact.
    "q_mix_weights" -> { (s, dir) =>
      val perSource = Tables(s, dir, "documents")
        .groupBy("source")
        .agg(sum(TA.bpeTokenCount(col("text"))).as("n_tokens"))
      Corpus.uniformMixWeights(perSource, "source", "n_tokens")
        .orderBy("source")
    },

    // Applying the mix weights: per-source doc multiplicities under the
    // uniform-token-budget weights (floor epochs + hash-fraction extra
    // copy — deterministic, append-stable) and the resulting token
    // budget. Closes the loop q_mix_weights opens: weights are not a
    // report, they are a sampling plan, and this is the plan applied.
    "q_mix_apply" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TA.bpeTokenCount(col("text")).as("n_tokens"))
      val weights = Corpus.uniformMixWeights(
        d.groupBy("source").agg(sum("n_tokens").as("n_tokens")),
        "source", "n_tokens")
      Corpus.applyMixWeights(d, "doc_id", "source", weights)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_copies") > 0, 1L).otherwise(0L)).as("n_kept"),
          sum("n_copies").as("total_copies"),
          sum(col("n_tokens") * col("n_copies")).as("tokens_out"))
        .orderBy("source")
    },

    // Sliding-window chunking: 128-char windows every 96 chars (32-char
    // overlap). One generator projection — no shuffle; chunk identity
    // verified by md5 so the oracle checks CONTENT, not just counts.
    "q_chunk_docs" -> { (s, dir) =>
      Corpus.chunkDocs(Tables(s, dir, "documents"), "doc_id", "text", 128, 32)
        .select(col("doc_id"), col("chunk_id"), col("n_chunks"),
          length(col("chunk_text")).cast("long").as("chunk_chars"),
          md5(col("chunk_text").cast("binary")).as("digest"))
        .orderBy("doc_id", "chunk_id")
    },

    // Deterministic stratified sample: 10 docs per source in id-hash
    // order — uniform over the group yet engine-reproducible.
    "q_stratified_sample" -> { (s, dir) =>
      Corpus.stratifiedSample(
          Tables(s, dir, "documents").select("doc_id", "source"),
          "doc_id", "source", 10)
        .orderBy("doc_id")
    },

    // Systematic PPS sample (100 draws by char mass): big docs can be
    // drawn multiply; exact integer arithmetic end to end, so the survey
    // draw itself is oracle-provable. Two-level cumsum shape (no
    // single-partition pass over the corpus).
    "q_pps_sample" -> { (s, dir) =>
      Corpus.ppsSample(
          Tables(s, dir, "documents").select("doc_id", "n_chars"),
          "doc_id", "n_chars", 100L)
        .select("doc_id", "n_chars", "cum_start", "cum_end", "multiplicity")
        .orderBy("doc_id")
    },

    // Per-source quality-quantile gate: each source keeps its own top
    // half by quality score (rank ties broken by doc_id — total order on
    // both engines), so a weak source is thinned, not starved.
    "q_quality_filter" -> { (s, dir) =>
      val scored = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TA.qualityScorePpm(col("text")).as("quality_ppm"))
      Corpus.quantileFilter(scored, "source", "quality_ppm", "doc_id", 500000L)
        .orderBy("doc_id")
    },

    // Incremental (cross-corpus) dedup: src0-src4 play the already-
    // ingested corpus; the rest is today's batch, deduped first within
    // itself (keep-min per key) and then against the seen keys by
    // anti-join. Key = the min-shingle near-dup fingerprint (dup-dense
    // on this corpus: most batch fingerprints collide with a seen doc).
    "q_dedup_incremental" -> { (s, dir) =>
      val sig = Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TA.minShingleFingerprint(col("text"), 8).as("fp"))
      val seenSrc = (0 to 4).map("src" + _)
      Dedup.exactAgainst(
          sig.filter(!col("source").isin(seenSrc: _*)),
          sig.filter(col("source").isin(seenSrc: _*)),
          "doc_id", "fp")
        .select(col("doc_id"), col("source"), col("fp"))
        .orderBy("doc_id")
    },

    // Eval-set decontamination: distinct 8-gram overlap of every train doc
    // (source <> src0) against the src0 "benchmark" corpus; eval grams
    // broadcast, train side never shuffles text.
    "q_contamination" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      Corpus.contamination(
        d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
        "doc_id", "text", k = 8)
        .orderBy("doc_id")
    },

    // Provenance attribution — the per-pair refinement a leakage audit
    // runs AFTER q_contamination's binary flag fires: which top-3 train
    // docs share the most distinct RARE 8-grams with each eval doc
    // (grams in >10 eval docs dropped — no attribution signal, and the
    // hot-gram fan-out hazard). Pair rows exist only for true rare
    // overlaps; the head is a window on the reduced pair table.
    "q_provenance" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      Corpus.provenance(
        d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
        "doc_id", "text", k = 8, topK = 3, maxEvalDf = 10)
        .orderBy("eval_id", "rnk")
    },

    // Bloom-prefiltered decontamination — q_contamination's exact result
    // through the runtime-filter shape: a driver-built bit table rejects
    // non-eval grams map-side before the broadcast verify join. Same
    // oracle as q_contamination (bit-identical output by construction —
    // the strongest possible check that the prefilter loses nothing).
    "q_contamination_bloom" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      Corpus.contaminationBloom(
        d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"),
        "doc_id", "text", k = 8)
        .orderBy("doc_id")
    },

    // Content + winnowing fingerprints.
    "q_fingerprint" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TA.fingerprint(col("text")).as("fp"),
        TA.minShingleFingerprint(col("text"), 8).as("shingle_fp"))
        .orderBy("doc_id")
    },

    // The full per-doc signal suite in ONE scan (stats + quality + langid
    // + repetition + fingerprints as a single codegen'd projection) — the
    // shape a real 100 TB profiling job runs; the per-signal queries above
    // stay for oracle granularity. No shuffle (PlanAudit-pinned).
    "q_doc_profile" -> { (s, dir) =>
      TA.profile(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // The profile's PRODUCTION path: same single-scan signal suite plus
    // the dedup signature columns, with the md5 min-shingle fingerprint
    // swapped for its xxhash64 twin — the md5-per-shingle walk dominates
    // the whole profile scan (~2/3 of forced warm cost) and a candidate
    // fingerprint needs stability, not md5. Rows-only (xxhash discipline);
    // ProfileSpec pins column-for-column agreement on the shared signals.
    // The declared query digests the 64-long minhash signature to ONE
    // xxhash64 scalar: the driver's gate sorts/hashes every output column
    // and cannot order an array<long> (r6 ADVICE), and a scalar digest is
    // the same evidence — any signature change flips it. Library users
    // call TextAnalysis.profile directly for the raw signature columns.
    "q_doc_profile_fast" -> { (s, dir) =>
      TA.profile(Tables(s, dir, "documents"), "doc_id", "text",
        signatures = true, fastFingerprint = true)
        .withColumn("minhash_digest", xxhash64(col("minhash_sig")))
        .drop("minhash_sig")
        .orderBy("doc_id")
    },

    // Keyword relevance retrieval: top-20 docs for a 3-term query under
    // integer-exact tf × reciprocal-df weighting (log-free tf-idf so the
    // oracle agrees bit-for-bit); deterministic tiebreak on doc_id.
    "q_keyword_search" -> { (s, dir) =>
      TA.keywordSearch(Tables(s, dir, "documents"), "doc_id", "text",
        Seq("query", "table", "stream"), k = 20)
    },

    // BM25 retrieval (integer-exact Okapi, k1=1.2 b=0.75): reciprocal-df
    // term weight × fraction-cleared length normalization — saturating tf
    // and a length penalty, what q_keyword_search's raw tf·idf lacks.
    "q_bm25_search" -> { (s, dir) =>
      TA.bm25Search(Tables(s, dir, "documents"), "doc_id", "text",
        Seq("query", "table", "stream"), k = 20)
    },

    // Hybrid retrieval: BM25 top-20 and embedding-cosine top-20 (query =
    // vec 0, a 1-row broadcast; docs and embeddings are 1:1 by id) fused
    // by reciprocal-rank fusion — the standard lexical+semantic combiner,
    // and fully integer-exact so the oracle composes the two PROVEN
    // retrieval oracles.
    "q_hybrid_search" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val emb = Tables(s, dir, "embeddings")
      // the 20-row bm25 result re-ranks in one partition — a window over
      // top-k output, never over the corpus
      val bm = TA.bm25Search(docs, "doc_id", "text",
          Seq("query", "table", "stream"), k = 20)
        .withColumn("rnk",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rnk"))
      val cos = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 20)
        .select(col("cand_id").as("doc_id"), col("rnk"))
      TA.rrfFuse(Seq(bm, cos), "doc_id", "rnk", k0 = 60L, topK = 10)
        .orderBy(col("rrf_ppm").desc, col("doc_id"))
    },

    // PII redaction — the privacy pass a training corpus runs first. The
    // test corpus carries no PII, so an email + phone + IPv4 are
    // synthesized IN-QUERY from doc_id (media-header discipline), then
    // redacted by the chained rules; the oracle mirrors synthesis and the
    // RE2-identical regex chain, and the typed hit counts must see
    // exactly one of each.
    "q_pii_redact" -> { (s, dir) =>
      val id = col("doc_id")
      val raw = concat(
        lit("reach user"), id, lit("@mail.example.com or +1 (555) 01"),
        lpad(pmod(id, lit(100)).cast("string"), 2, "0"),
        lit("-4242 via 10.0."), pmod(id, lit(256)).cast("string"),
        lit(".7 :: "), col("text"))
      val base = Tables(s, dir, "documents").select(id, raw.as("raw"))
      val counts = TA.piiCounts(col("raw")).map { case (n, c) => c.as(s"n_$n") }
      base.select(
        Seq(id, TA.redactPii(col("raw")).as("text_redacted")) ++ counts: _*)
        .orderBy("doc_id")
    },

    // TRUE BPE token accounting (classic lowest-rank merge loop over the
    // BpeFixture table) next to the regex heuristic — what a real
    // tokenizer would bill per doc vs the approximation the budget
    // queries use. Rows-only: the data-dependent merge iteration is not
    // SQL-expressible (BpeTokenCountSpec carries the algorithmic truth
    // via an independent reference implementation).
    "q_bpe_tokens" -> { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        graft.functions.BpeTokenCount(col("text")).as("n_tokens_bpe_true"),
        TA.bpeTokenCount(col("text")).as("n_tokens_bpe_approx"))
        .orderBy("doc_id")
    },

    // TRUE BPE encoding — the apply side of the tokenizer story: emit the
    // actual token stream (not just the bill) under the fixture merge
    // table, as a pure codegen'd projection. Rows-only (the merge loop is
    // data-dependent iteration, not SQL-expressible); BpeEncodeSpec pins
    // reference-encoder equality, size==BpeTokenCount parity, and the
    // concat round-trip (tokens rejoin to the input minus spaces).
    "q_bpe_encode" -> { (s, dir) =>
      val toks = graft.functions.BpeEncode(col("text"))
      Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_unique_tokens"),
          array_join(slice(toks, 1, 8), " ").as("head_tokens"))
        .orderBy("doc_id")
    },

    // Winnowed-fingerprint candidate pairs — q_containment's production
    // twin (MOSS winnowing): ~n/w fingerprints per doc, corpus-linear
    // bucket self-join, guarantee that any >= w+k-1-char shared substring
    // yields a shared fingerprint. Rows-only (xxhash64 fingerprints);
    // WinnowSpec carries the reference-equality and guarantee truths.
    "q_winnow_pairs" -> { (s, dir) =>
      Dedup.winnowedPairs(Tables(s, dir, "documents"), "doc_id", "text",
        k = 8, w = 16, minShared = 3L, maxBucket = 32)
        .orderBy("doc1", "doc2")
    },

    // Shift-resistant near-dup pairs via content-defined chunking
    // (LBFS/FastCDC): edits move one chunk, every later boundary
    // re-syncs — the duplication family fixed shingling desynchronizes
    // on. Rows-only (xxhash digests per the hash-ops discipline);
    // CdcSpec carries the shift-invariance truth.
    "q_cdc_pairs" -> { (s, dir) =>
      Dedup.cdcPairs(Tables(s, dir, "documents"), "doc_id", "text",
        avgBits = 5, minShared = 3L, maxBucket = 256)
        .orderBy("doc1", "doc2")
    },

    // Mergeable vocabulary sketches: per-source distinct-token HLL
    // (DataSketches, lgK=12 → ~1.6% rse) UNIONED into the corpus estimate
    // WITHOUT re-scanning — the 100 TB distinct-counting shape (per-slice
    // sketches persist; any slice combination answers by merge). The
    // exact countDistinct column is the in-query verification at test SF.
    // Rows-only: sketch registers are engine-internal; VocabSketchSpec
    // carries the mergeability identity + error-bound truth.
    "q_vocab_sketch" -> { (s, dir) =>
      val toks = Tables(s, dir, "documents")
        .select(col("source"),
          explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("w"))
      val perSrc = toks.groupBy("source").agg(
        expr("hll_sketch_agg(w, 12)").as("__sk"),
        countDistinct(col("w")).as("exact_distinct"))
      val srcRows = perSrc.select(col("source"), col("exact_distinct"),
        expr("hll_sketch_estimate(__sk)").cast("long").as("est_distinct"))
      val unioned = perSrc.agg(
        expr("hll_sketch_estimate(hll_union_agg(__sk))").cast("long")
          .as("est_distinct"))
      val allRow = toks.agg(countDistinct(col("w")).as("exact_distinct"))
        .crossJoin(broadcast(unioned))
        .select(lit("__ALL__").as("source"), col("exact_distinct"),
          col("est_distinct"))
      srcRows.unionByName(allRow)
        .select(col("source"), col("exact_distinct"), col("est_distinct"),
          (abs(col("est_distinct") - col("exact_distinct")) * lit(1000000L) /
            greatest(col("exact_distinct"), lit(1L))).cast("long").as("err_ppm"))
        .orderBy("source")
    },

    // Containment pairs (Broder's asymmetric measure): the subset-dup
    // detector — a doc quoted/embedded inside a larger one scores 1.0
    // where Jaccard sees almost nothing. Language-blocked (deliberately
    // size-INDEPENDENT blocking: cross-size pairs are the point), the
    // oracle-exact quadratic demo like q_dedup_ngram; LSH paths are the
    // production candidate source.
    "q_containment" -> { (s, dir) =>
      Dedup.ngramContainmentPairs(Tables(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq("lang"), k = 3, minPpm = 900000L)
        .orderBy("doc1", "doc2")
    },

    // KMV sketch twin of q_source_overlap: the exact matrix DISTINCTs the
    // (source, token) population and self-joins it — two corpus-sized
    // shuffles; here each partition ships ONE O(k) partial per source (the
    // sketch absorbs duplicates, so no distinct pass exists at all) and
    // the 190-pair grid reads 2k longs per cell through the codegen'd
    // readers. The tiny non-equi pair join is dimension-scale by
    // construction (sources², never corpus). Hash-based → rows-only; the
    // estimator guarantees are spec-pinned (KmvSketchSpec: exact below
    // capacity, merge-deterministic, ~1/sqrt(k-2) CV at capacity).
    "q_kmv_overlap" -> { (s, dir) =>
      val k = 256
      // eager checkpoint: the sources-row sketch table computes ONCE (one
      // corpus scan, one exchange of O(k) partials); a lazy self-join
      // would re-run the whole aggregation for each side
      val sk = Tables(s, dir, "documents")
        .select(col("source"),
          explode(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("token"))
        .filter(length(col("token")) >= 3)
        .groupBy("source")
        .agg(KmvSketch(xxhash64(col("token")), k).as("sk"))
        .lineageCut()
      sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          KmvJaccardPpm(col("a.sk"), col("b.sk"), k).as("jacc_est_ppm"),
          KmvDistinctEstimate(col("a.sk"), k).as("n_a_est"),
          KmvDistinctEstimate(col("b.sk"), k).as("n_b_est"))
        .orderBy("src_a", "src_b")
    },

    // Adjacent-bigram collocation table: top-30 pairs by count with the
    // integer-exact lift score (log-free PMI) — the corpus statistic a
    // tokenizer/mix design reads for multi-word units and template
    // phrases. Bigrams via the codegen'd adjacent_join kernel.
    "q_ngram_colloc" -> { (s, dir) =>
      TA.collocations(Tables(s, dir, "documents"), "doc_id", "text", k = 30)
        .orderBy(col("c_xy").desc, col("bigram"))
    },

    // Bigram-LM quality score (CCNet-family): per-doc floor mean and
    // minimum of the integer-exact corpus transition probability
    // (c(w1,w2)*1e6 div c(w1,·)) — the statistical typicality signal the
    // heuristic scores cannot see. Docs with <2 word tokens are absent by
    // construction on both engines.
    "q_lm_score" -> { (s, dir) =>
      TA.lmScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Quality-score calibration: per score decile, population, mean
    // length and byte-duplicate rate — the table a corpus owner reads to
    // PLACE the quality threshold (low deciles should show short/dupey
    // docs if the score works). Composition of proven pieces; one
    // slim-key aggregate after a pure projection.
    "q_quality_calibration" -> { (s, dir) =>
      Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"),
          TA.qualityScorePpm(col("text")).as("__q"))
        .withColumn("quality_bucket", expr("__q div 100000"))
        .groupBy("quality_bucket")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(length(text)) div count(1)").as("mean_chars"),
          countDistinct(md5(col("text").cast("binary"))).as("n_distinct"))
        .select(col("quality_bucket"), col("n_docs"), col("mean_chars"),
          expr("((n_docs - n_distinct) * 1000000) div n_docs").as("dup_ppm"))
        .orderBy("quality_bucket")
    },

    // Encoding-sanity intake report. The test corpus is clean ASCII, so
    // decode flaws are synthesized IN-QUERY by doc-id residue
    // (media-header discipline): 1 -> a U+FFFD replacement char, 2 -> a
    // BEL control char, 3 -> non-ASCII "café", 0 -> untouched; the
    // oracle derives every count from the residue classes independently.
    "q_encoding_report" -> { (s, dir) =>
      val flaw = when(pmod(col("doc_id"), lit(4)) === 1, lit("\uFFFD"))
        .when(pmod(col("doc_id"), lit(4)) === 2, lit("\u0007"))
        .when(pmod(col("doc_id"), lit(4)) === 3, lit(" café"))
        .otherwise(lit(""))
      val raw = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          concat(col("text"), flaw).as("raw"))
      TA.encodingReport(raw, "raw", "source").orderBy("source")
    },

    // Cross-snapshot LM scoring: odd docs (the "fresh crawl") scored
    // under the bigram model of even docs (the "trusted snapshot") —
    // the CCNet external-LM shape; unseen transitions score 0 and are
    // counted separately.
    "q_lm_cross_score" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      TA.lmScoreAgainst(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text")
        .orderBy("doc_id")
    },

    // Compressibility signal: raw-DEFLATE byte count and floor-scaled
    // ratio per doc — the band-pass quality heuristic (template spam
    // compresses to almost nothing, binary junk not at all) every public
    // web-corpus pipeline runs next to the length/punct scores. Rows-only:
    // DEFLATE's LZ77+Huffman stream is not SQL-expressible (the BPE
    // precedent); CompressionSpec carries the algorithmic truth against
    // java.util.zip directly.
    "q_compression_ratio" -> { (s, dir) =>
      val raw = octet_length(col("text")).cast("long")
      Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.DeflateLen(col("text")).as("deflate_bytes"),
          raw.as("raw_bytes"))
        .select(col("doc_id"), col("deflate_bytes"), col("raw_bytes"),
          (col("deflate_bytes") * lit(1000000L) / greatest(col("raw_bytes"), lit(1L)))
            .cast("long").as("compression_ppm"))
        .orderBy("doc_id")
    },

    // Corpus cleaning: normalize (CR/tab/control/space-run handling) then
    // drop boilerplate lines by line document-frequency. The test corpus
    // is single-line, so multi-line docs are synthesized IN-QUERY (the
    // media-header discipline): per-source header + text with a stray
    // control char + universal footer; header (df=docs/source) and footer
    // (df=corpus) exceed maxLineDf and must be dropped, the text line
    // survives. The oracle mirrors the synthesis and derives the cleaned
    // corpus independently.
    "q_text_clean" -> { (s, dir) =>
      val raw = Tables(s, dir, "documents").select(col("doc_id"),
        // concat (not concat_ws): a null text must nullify the whole raw
        // doc, matching the oracle's || chain — concat_ws would silently
        // skip the null line and diverge on any corpus with null texts
        concat(
          lit("===\t"), col("source"), lit(" ===\n"),
          col("text"), lit("\u0001\n"),
          lit("Generated by example corpus v1")).as("raw"))
      TA.clean(raw, "doc_id", "raw", maxLineDf = 20L).orderBy("doc_id")
    },

    // Per-source duplication-rate report — the first dedup diagnostic a
    // corpus owner reads: how much of each slice is byte-identical
    // copies. distinct-digest count vs doc count, floor-scaled.
    "q_dedup_rate" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .filter(col("text").isNotNull)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text").cast("binary"))).as("n_distinct"))
        .select(col("source"), col("n_docs"), col("n_distinct"),
          expr("((n_docs - n_distinct) * 1000000) div n_docs").as("dup_ppm"))
        .orderBy("source")
    },

    // Corpus card — the dataset-datasheet report every corpus release
    // ships: per source, volume (docs/chars/tokens), duplication ppm,
    // floor-mean quality, English share, mean repetition — ALL from the
    // proven per-doc signal trees, fused into one scan + one grouped
    // aggregate (the q_doc_profile composition argument applied at the
    // report level). Null-text docs count in n_docs/n_null_text and drop
    // out of every signal aggregate (count/sum null semantics, identical
    // on both engines; lang falls to 'und' both sides).
    "q_corpus_card" -> { (s, dir) =>
      val t = col("text")
      val perDoc = Tables(s, dir, "documents").select(
        col("source"), t.as("text"),
        length(t).cast("long").as("n_chars"),
        TA.tokenCount(t).as("n_tokens"),
        TA.qualityScorePpm(t).as("quality_ppm"),
        TA.langId(t).as("lang_pred"),
        graft.functions.RepetitionPpm(t, 3).as("rep_ppm"),
        md5(t.cast("binary")).as("digest"))
      perDoc.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
          sum(col("n_chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          count(col("digest")).as("__n_txt"),
          countDistinct(col("digest")).as("__n_distinct"),
          sum(col("quality_ppm")).as("__q_sum"),
          count(col("quality_ppm")).as("__q_n"),
          sum(when(col("lang_pred") === "en", 1L).otherwise(0L)).as("__n_en"),
          sum(col("rep_ppm")).as("__r_sum"),
          count(col("rep_ppm")).as("__r_n"))
        .select(col("source"), col("n_docs"), col("n_null_text"),
          col("total_chars"), col("total_tokens"),
          expr("((__n_txt - __n_distinct) * 1000000) div greatest(__n_txt, 1)").as("dup_ppm"),
          expr("__q_sum div greatest(__q_n, 1)").as("avg_quality_ppm"),
          expr("(__n_en * 1000000) div greatest(__q_n, 1)").as("share_en_ppm"),
          expr("__r_sum div greatest(__r_n, 1)").as("avg_rep_ppm"))
        .orderBy("source")
    },

    // Snapshot diff — the between-crawls ingest report: two snapshots
    // synthesized from the corpus (old drops id%10==9, new drops
    // id%10==0 and edits id%10==1), diffed by content digest into
    // per-(source, status) counts. Digest comparison makes the changed/
    // unchanged split content-based, not metadata-based.
    "q_snapshot_diff" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val oldSnap = d.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      val newSnap = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
        .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 1,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      Corpus.snapshotDiff(oldSnap, newSnap, "doc_id", "text", "source")
        .orderBy("source", "status")
    },

    // Distributed BPE merge LEARNING — train the tokenizer's merge table
    // on the corpus (the training-side twin of q_bpe_tokens' counter):
    // one corpus scan to the word-frequency table, then every merge round
    // iterates on the vocabulary only. Rows-only: the data-dependent
    // iteration is not SQL-expressible (the BPE precedent);
    // BpeTrainerSpec pins exact equality with an independent in-memory
    // reference trainer including the tie rule.
    "q_bpe_learn" -> { (s, dir) =>
      graft.operators.BpeTrainer
        .learnMerges(Tables(s, dir, "documents"), "text", numMerges = 12)
        .orderBy("rank")
    },

    // Learn → encode → bill: the COMPOSED tokenizer workflow a real
    // pipeline runs — train a merge table on the corpus (one corpus scan
    // + vocab-only rounds), ship it to executors as a codegen reference
    // object (broadcast-dim analogue), and re-bill the corpus with the
    // tokenizer it just learned. Per-source fertility (tokens per million
    // chars, floor-scaled) is the number mixture budgeting actually uses.
    // Rows-only (BPE precedent); BpeEncodeSpec pins learned-table parity.
    // Digit runs bill as one token (the counting kernels' documented
    // contract), so learned digit-pair merges are inert by design.
    "q_bpe_fertility" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents").filter(col("text").isNotNull)
      val table = graft.operators.BpeTrainer.tableOf(
        graft.operators.BpeTrainer.learnMerges(docs, "text", numMerges = 12))
      docs.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(graft.functions.BpeTokenCount(col("text"), table)).as("total_tokens"),
          sum(length(col("text")).cast("long")).as("total_chars"))
        .select(col("source"), col("n_docs"), col("total_tokens"), col("total_chars"),
          expr("(total_tokens * 1000000) div total_chars").as("tok_per_mchar"))
        .orderBy("source")
    },

    // HTML extraction — the stage before any cleaning: script/style
    // blocks dropped, tags stripped, entities single-decoded (&amp; LAST
    // so &amp;lt; yields the literal "&lt;", not "<"), whitespace
    // collapsed. Markup synthesized IN-QUERY around the plain-text corpus
    // (media-header discipline), with planted entity/flag/lazy-quantifier
    // corners; the oracle mirrors every regex and the replace chain.
    "q_html_extract" -> { (s, dir) =>
      val id = col("doc_id")
      val html = concat(
        lit("<html><head><title>Doc "), id,
        lit("</title><style type=\"text/css\">body { margin: 0; }</style>"),
        lit("<SCRIPT>var n = 1 < 2 && 3 > 2;</SCRIPT></head><body><h1 class=\"t\">Doc "), id,
        lit("</h1><p>"), col("text"),
        lit("</p><p>Tom &amp; Jerry &lt;3 say &quot;hi&quot; &amp;lt; &#39;q&#39;&nbsp;end</p></body></html>"))
      Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(id, html.as("__h"))
        .select(id,
          TA.extractHtml(col("__h")).as("text_extracted"),
          TA.htmlTagCount(col("__h")).as("n_tags"))
        .orderBy("doc_id")
    },

    // Filter-cascade report — the C4-style quality gate as ONE projection
    // over proven oracle-exact signals (length, kernel repetition ppm,
    // quality ppm), with first-failing-rule verdicts and per-source pass
    // shares. Thresholds sit at the corpus's p5/p95 tails so every
    // verdict class is populated at test SF.
    "q_filter_report" -> { (s, dir) =>
      val sig = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("source"),
          length(col("text")).cast("long").as("__chars"),
          graft.functions.RepetitionPpm(col("text"), 3).as("__rep"),
          TA.qualityScorePpm(col("text")).as("__q"))
      val verdict = when(col("__chars") < 100, "too_short")
        .when(col("__rep") > 35000, "repetitive")
        .when(col("__q") < 400000, "low_quality")
        .otherwise("pass")
      sig.select(col("source"), verdict.as("verdict"))
        .groupBy("source", "verdict").agg(count(lit(1)).as("n_docs"))
        .withColumn("share_ppm",
          expr("(n_docs * 1000000) div sum(n_docs) over (partition by source)"))
        .orderBy("source", "verdict")
    },

    // Intra-doc duplicate-line removal (the C4-style "repeated lines
    // within a page" pass — invisible to q_text_clean's corpus-level df
    // drop). Single-line test corpus, so multi-line docs with in-doc
    // repeats are synthesized IN-QUERY: nav + cookie lines repeat in
    // every doc, and even ids also repeat their text line while odd ids
    // carry a unique extra line — kept/dropped counts vary by parity.
    "q_line_dedup" -> { (s, dir) =>
      val id = col("doc_id")
      val mid = when(pmod(id, lit(2)) === 0, concat(lit("\n"), col("text")))
        .otherwise(concat(lit("\nextra "), id))
      val raw = Tables(s, dir, "documents").select(id,
        concat(lit("nav: "), col("source"), lit("\n"), col("text"),
          lit("\nnav: "), col("source"), lit("\ncookie notice"), mid,
          lit("\ncookie notice")).as("raw"))
      TA.dedupLines(raw, "doc_id", "raw").orderBy("doc_id")
    },

    // CORPUS-wide keep-first line dedup (RefinedWeb-style): a line
    // survives only where it globally first appears — cross-doc
    // boilerplate below any df threshold collapses to one copy, dup
    // texts keep their min-doc instance. Synthesized multi-line docs
    // (media-header discipline): per-source nav (first doc of the
    // source keeps it), the text line (dup texts keep-first), a unique
    // id line (always kept), and a universal footer (exactly one doc
    // in the corpus keeps it).
    "q_corpus_line_dedup" -> { (s, dir) =>
      val raw = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(lit("nav: "), col("source"), lit("\n"), col("text"),
            lit("\nid: "), col("doc_id"), lit("\ncookie notice")).as("raw"))
      TA.dedupLinesCorpus(raw, "doc_id", "raw").orderBy("doc_id")
    },

    // Boilerplate-frequency report — what a corpus owner reads before
    // choosing q_text_clean's maxLineDf: every line reaching df>=20 with
    // doc/occurrence counts and corpus share. Same synthesis as
    // q_corpus_line_dedup; the unique id lines (df=1) must NOT appear.
    "q_boilerplate_report" -> { (s, dir) =>
      val raw = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(lit("nav: "), col("source"), lit("\n"), col("text"),
            lit("\nid: "), col("doc_id"), lit("\ncookie notice")).as("raw"))
      TA.boilerplateReport(raw, "doc_id", "raw", minDf = 20L).orderBy("line")
    },

    // Token-budget selection: best docs by quality score until 20k
    // tokens are claimed — the "fill the training budget from the top"
    // selection every data-constrained run performs. The operator's
    // two-level cumulative sum (range buckets + bucket-prefix broadcast)
    // must equal the oracle's single global window EXACTLY — the
    // hash-match is the proof the decomposition is sound.
    "q_budget_select" -> { (s, dir) =>
      val scored = Tables(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"),
          TA.qualityScorePpm(col("text")).as("quality_ppm"),
          TA.bpeTokenCount(col("text")).as("n_tokens"))
      Corpus.selectByBudget(scored, "doc_id", "quality_ppm", "n_tokens",
        budgetTokens = 20000L, buckets = 32)
        .orderBy("doc_id")
    },

    // Exact dedup by content hash.
    "q_dedup_exact" -> { (s, dir) =>
      Dedup.exact(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("digest")
    },

    // Dedup clusters: the transitive closure over the UNION of two
    // duplicate signals — exact content hash and the winnowing min-shingle
    // fingerprint (A≈B by one signal, B≈C by the other ⇒ one cluster).
    // Each signal contributes LINEAR star edges (doc → its group's min
    // id), never pairwise cliques, so edge volume is O(corpus) at 100 TB;
    // components by Dedup.connectedComponents (pointer-jumping min-label,
    // O(log n) rounds). component = min doc_id of the cluster (the doc a
    // keep-one dedup pass retains); singletons are their own component.
    // URL canonicalization — the dedup key web corpora apply before any
    // content signal. The test corpus has no URL column, so URLs are
    // synthesized IN-QUERY (media-header discipline) with a rotating flaw
    // per doc (case, www, default port, tracking params, fragment); the
    // oracle derives the expected canonical form per variant DIRECTLY —
    // any canonicalization bug hash-mismatches.
    "q_canonical_url" -> { (s, dir) =>
      val id = col("doc_id")
      val url = when(pmod(id, lit(5)) === 0,
          concat(lit("https://example.org/p/"), id, lit("?q="), id))
        .when(pmod(id, lit(5)) === 1,
          concat(lit("HTTPS://WWW.EXAMPLE.ORG/p/"), id, lit("?q="), id))
        .when(pmod(id, lit(5)) === 2,
          concat(lit("http://example.org:80/p/"), id, lit("?utm_source=feed&q="), id))
        .when(pmod(id, lit(5)) === 3,
          concat(lit("https://example.org:443/p/"), id, lit("?q="), id, lit("&utm_medium=rss#sec")))
        .otherwise(
          concat(lit("https://example.org/p/"), id, lit("?utm_a=1&gclid=x")))
      Tables(s, dir, "documents")
        .select(id, url.as("url"))
        .select(id, col("url"), Corpus.canonicalUrl(col("url")).as("canonical"))
        .orderBy("doc_id")
    },

    // Keep-best re-crawl selection: docs sharing a canonical URL (the
    // q_dedup_cluster synthesis — id%10 in {0,1} are two crawls of one
    // page) collapse to the highest-quality copy, ties to the earliest
    // id. The keep-BEST twin of exact dedup's keep-min: dedup should
    // retain the best version, not the arbitrary first.
    "q_url_keep_best" -> { (s, dir) =>
      val id = col("doc_id")
      val pid = (id / 10).cast("long")
      val url = when(pmod(id, lit(10)) === 0,
          concat(lit("https://example.org/p/"), pid))
        .when(pmod(id, lit(10)) === 1,
          concat(lit("HTTPS://WWW.EXAMPLE.ORG:443/p/"), pid,
            lit("?utm_source=feed&utm_medium=rss#sec")))
        .otherwise(concat(lit("https://example.org/u/"), id))
      val scored = Tables(s, dir, "documents").select(id,
        Corpus.canonicalUrl(url).as("canonical"),
        TA.qualityScorePpm(col("text")).as("quality_ppm"))
      Corpus.keepBest(scored, "canonical", "quality_ppm", "doc_id")
        .withColumnRenamed("n_group", "n_crawls")
        .orderBy("doc_id")
    },

    // Fuzzy eval-set decontamination — the MinHash scale path next to
    // q_contamination's exact broadcast-gram check: flags train docs that
    // NEAR-duplicate an eval doc (paraphrase drift) instead of requiring
    // a verbatim 8-gram. Rows-only (xxhash64 signatures); the estimate
    // quality is spec-proven against exact Jaccard in PipelineOpsSpec.
    "q_fuzzy_contamination" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      Dedup.minhashContamination(
        d.filter(col("source") =!= "src0"), "doc_id", "text",
        d.filter(col("source") === "src0"), "doc_id", "text",
        minEstPpm = 500000L)
        .orderBy("train_id", "eval_id")
    },

    "q_dedup_cluster" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      // persisted: the star() calls and their root aggregations reuse the
      // signature pass (the min-shingle md5 sweep) instead of recomputing
      // it six times
      val id = col("doc_id")
      // third signal: canonical URL (synthesized in-query — docs with
      // id%10 in {0,1} share a page behind different surface flaws, so the
      // canonicalizer must collapse them for the oracle's closure to
      // match; the other 80% get unique URLs, the realistic shape — a URL
      // signal that pairs the WHOLE corpus would flood CC with synthetic
      // components and time nothing real)
      val pid = (id / 10).cast("long")
      val url = when(pmod(id, lit(10)) === 0,
          concat(lit("https://example.org/p/"), pid))
        .when(pmod(id, lit(10)) === 1,
          concat(lit("HTTPS://WWW.EXAMPLE.ORG:443/p/"), pid,
            lit("?utm_source=feed&utm_medium=rss#sec")))
        .otherwise(concat(lit("https://example.org/u/"), id))
      // EAGER cut, not a lazy persist (r15): the edge union fans into six
      // concurrent window branches (3 signals x 2 directions inside CC's
      // bi-union), and concurrent stages racing an unmaterialized cache
      // each recompute the signature pass — measured 6x duplicate kernel
      // work at sf0.1. One eager materialization runs the expensive
      // md5/min-shingle/canonical-url sweep exactly once — fanned out
      // first so the sweep parallelizes on an unsplittable scan
      // (Tables.fanOutKernel; guide §2.5, no-op on real layouts).
      val sig = Tables.fanOutKernel(d.select(col("doc_id"), col("text")))
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("s_text"),
          TA.minShingleFingerprint(col("text"), 8).as("s_shingle"),
          Corpus.canonicalUrl(url).as("s_url"))
        .lineageCut()
      // star edges via a window min — one shuffle per signal and NO join
      // back (the former groupBy-roots + equi-join shape paid the same
      // shuffle plus a join per signal; window A/B'd a wash, kept for the
      // simpler plan that matches the oracle's formulation). NULL
      // signatures contribute NO edges: a window partition would lump all
      // NULLs together and dedup docs of UNKNOWN content (the old join
      // shape dropped null keys by SQL equality — keep that semantics).
      def star(c: String) = {
        import org.apache.spark.sql.expressions.Window
        sig.filter(col(c).isNotNull)
          .select(col("doc_id").as("src"),
            min("doc_id").over(Window.partitionBy(col(c))).as("dst"))
          .filter(col("src") =!= col("dst"))
      }
      val edges = star("s_text").union(star("s_shingle")).union(star("s_url"))
      // sig is an eager checkpoint, not a cache-manager entry: its blocks
      // are reclaimed by the ContextCleaner once this reference drops
      // (Dataset.unpersist would be a no-op on it — r15 advice)
      val comp = Dedup.connectedComponents(edges, "src", "dst")
      d.select(col("doc_id"))
        // label re-attach hash-builds on the comp side: the label table is
        // CORPUS-SIZED (one row per clustered node) and its checkpointed
        // ExistingRDD stats are unreliable — left alone the planner
        // broadcasts it (the q_lm_score hazard class; PlanAudit's
        // checkpoint-broadcast sweep pins this repo-wide)
        .join(comp.withColumnRenamed("node", "doc_id").hint("shuffle_hash"),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
        .orderBy("doc_id")
    },

    // Exact 3-gram Jaccard near-dup pairs, blocked by (lang, length/100).
    // Blocked all-pairs is deliberate here: prefix filtering
    // (Dedup.prefixJaccardPairs) was A/B-measured on this corpus and LOST
    // (49.8M candidates vs 588k blocked pairs at sf0.1 — the synthetic
    // corpus has only 272 distinct trigrams, so rare-token prefixes don't
    // exist; see the operator's scaladoc for the applicability boundary).
    // The big-corpus path remains q_dedup_lsh_verified.
    "q_dedup_ngram" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .withColumn("len_band", floor(col("n_chars") / 100))
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        blockCols = Seq("lang", "len_band"), k = 3, minPpm = 800000L)
        .orderBy("doc1", "doc2")
    },

    // The PRODUCTION fallback leg of blocked n-gram Jaccard, exercised on
    // the real corpus: PairRoute.Auto with a block cap the `en` lang
    // block genuinely exceeds at sf0.01 AND sf0.1 (218 / 2059 docs vs cap
    // 100), so the default plan runs BOTH legs — exact pairs for the cool
    // langs, LSH-candidates + exact verify for the hot ones. Rows-only
    // (xxhash64 candidate gen); PipelineOpsSpec pins Auto pair-set
    // equality vs the uncapped exact plan and the no-nested-loop shape,
    // PlanAudit pins the declared plan.
    "q_dedup_ngram_auto" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq("lang"), k = 3, minPpm = 800000L,
        maxBlockPopulation = 100L, route = Dedup.PairRoute.Auto)
        .orderBy("doc1", "doc2")
    },

    // The LINEAR-output twin of q_dedup_ngram_auto: production dedup
    // consumes clusters (keep-best needs doc -> cluster-min), not the
    // C(n,2) pair list that makes mega-cluster output quadratic (16 GiB
    // x30 sorter spill measured on the pair contract). Hot blocks emit
    // <= bands star edges per doc (each to its band bucket's min),
    // exact-verified with the same k/threshold, then connected
    // components. Same block cap as the pair twin so both legs exercise.
    // Rows-only (xxhash64 + iterative CC); PipelineOpsSpec pins
    // cluster-set equality with CC over the pair route's output.
    "q_dedup_auto_clusters" -> { (s, dir) =>
      Dedup.autoClusters(Tables(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq("lang"), k = 3, minPpm = 800000L,
        maxBlockPopulation = 100L)
        .orderBy("doc")
    },

    // The production-dedup loop CLOSED (r14): autoClusters → keepBest —
    // the composition the linear cluster contract exists for. Keep one
    // survivor per near-dup cluster (highest quality_ppm, ties to the
    // lowest doc id) over the same corpus/caps as the cluster twin, so
    // both legs (cool exact pairs + hot star edges) exercise. End to end
    // nothing quadratic ever materializes: star edges are <= bands per
    // doc, labels are one row per doc, scores attach via a hash-built
    // join (the label side is checkpoint-derived — unreliable stats, the
    // q_lm_score hazard class), and the survivor pick is ONE window
    // shuffle on the cluster key. Rows-only (xxhash64 + iterative CC);
    // PipelineOpsSpec pins survivor-set equality vs an independent
    // union-find + max-score pick over the exact pair route.
    "q_dedup_auto_keep" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val clusters = Dedup.autoClusters(docs, "doc_id", "text",
        blockCols = Seq("lang"), k = 3, minPpm = 800000L,
        maxBlockPopulation = 100L)
      val scored = docs.select(col("doc_id").as("doc"),
        TA.qualityScorePpm(col("text")).as("quality_ppm"))
      Corpus.keepBest(clusters.join(scored.hint("shuffle_hash"), Seq("doc")),
          "cluster", "quality_ppm", "doc")
        .withColumnRenamed("n_group", "n_members")
        .orderBy("doc")
    },

    // Scale-safe exact near-dup: LSH candidates → exact Jaccard verify
    // (rows-only: xxhash64 candidate gen; PipelineOpsSpec proves the pair
    // set ⊇ the blocked-all-pairs set with identical exact scores). The
    // recommended big-corpus path — candidate volume is bounded by LSH
    // buckets, not block population.
    "q_dedup_lsh_verified" -> { (s, dir) =>
      Dedup.lshVerifiedPairs(Tables(s, dir, "documents"), "doc_id", "text",
        verifyK = 3, candidateK = 5, bands = 16, rowsPerBand = 4,
        minPpm = 800000L)
        .orderBy("doc1", "doc2")
    },

    // MinHash-LSH candidates (rows-only: bucket join + estimate).
    "q_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashLshPairs(Tables(s, dir, "documents"), "doc_id", "text",
        k = 5, bands = 16, rowsPerBand = 4, minEstPpm = 400000L)
        .orderBy("doc1", "doc2")
    },

    // SimHash near-dup candidates (rows-only). Radius 3 is the standard
    // 64-bit simhash near-dup threshold; the banding is pigeonhole-complete
    // at ANY declared radius (PipelineOpsSpec proves exhaustive recall at
    // 12), but bucket selectivity is 2^(64/(d+1)) — declare the smallest
    // radius you mean on a big corpus.
    "q_simhash" -> { (s, dir) =>
      Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)
        .orderBy("doc1", "doc2")
    },

    // Multimodal metadata over binary payloads (columnar path; decode stub
    // exercised in MultimodalSpec).
    "q_multimodal_meta" -> { (s, dir) =>
      Multimodal.withPayload(Tables(s, dir, "documents"), "doc_id", "text")
        .select(
          col("doc_id"), col("n_bytes"), col("digest"),
          (lit(64) + pmod(col("n_bytes"), lit(960))).cast("int").as("width"),
          (lit(64) + pmod(col("n_bytes") * 7919, lit(704))).cast("int").as("height"),
          (lit(1) + floor(col("n_bytes") / 256)).cast("int").as("n_frames"))
        .orderBy("doc_id")
    },

    // Real header-only image parse. Payloads are synthesized IN-QUERY as
    // valid PNG / JPEG / GIF containers (hex construction from doc_id
    // alone, so the scan prunes to one column), then parsed back by the
    // codegen'd ImageMeta expression. The oracle computes the expected
    // format/dimensions independently from doc_id — any bug in the byte
    // walk (endianness, segment lengths, SOF offsets) hash-mismatches.
    "q_image_headers" -> { (s, dir) =>
      val id = col("doc_id")
      val w = (lit(16) + pmod(id, lit(2048))).cast("int")
      val h = (lit(16) + pmod(id * 31, lit(1536))).cast("int")
      val wHex8 = lpad(hex(w), 8, "0"); val hHex8 = lpad(hex(h), 8, "0")
      val wHex4 = lpad(hex(w), 4, "0"); val hHex4 = lpad(hex(h), 4, "0")
      // little-endian 16-bit = byte-swapped hex pair
      def le(hx: org.apache.spark.sql.Column) =
        concat(substring(hx, 3, 2), substring(hx, 1, 2))
      val pngHex = concat(
        lit("89504E470D0A1A0A0000000D49484452"), wHex8, hHex8, lit("0806000000"))
      val jpegHex = concat( // SOI + APP0(JFIF) + SOF0(len 0x0B, 1 component)
        lit("FFD8FFE000104A46494600010100000100010000FFC0000B08"),
        hHex4, wHex4, lit("01011100"))
      val gifHex = concat(lit("474946383961"), le(wHex4), le(hHex4), lit("F7000000"))
      val payload = unhex(
        when(pmod(id, lit(3)) === 0, pngHex)
          .when(pmod(id, lit(3)) === 1, jpegHex)
          .otherwise(gifHex))
      Tables(s, dir, "documents")
        .select(id, ImageMeta(payload).as("m"))
        .select(id, col("m.format").as("img_format"),
          col("m.width").as("width"), col("m.height").as("height"))
        .orderBy("doc_id")
    },

    // Real RIFF/WAVE chunk-walk parse, same discipline as q_image_headers:
    // valid WAV headers synthesized in-query from doc_id (even ids get an
    // extra LIST chunk so the walk is exercised, not just offset 12), then
    // parsed back by the codegen'd AudioMeta expression; the oracle derives
    // the expected fmt fields and duration independently.
    "q_audio_headers" -> { (s, dir) =>
      val id = col("doc_id")
      val rate = element_at(
        array(lit(8000), lit(16000), lit(22050), lit(44100), lit(48000)),
        (pmod(id, lit(5)) + 1).cast("int"))
      val channels = (lit(1) + pmod(id, lit(2))).cast("int")
      val bits = (lit(8) * (lit(1) + pmod(id, lit(3)))).cast("int")
      val bytesPerFrame = (channels * (bits / lit(8)).cast("int")).cast("int")
      val byteRate = (rate * bytesPerFrame).cast("long")
      val dataBytes = pmod((id + 1) * 977, lit(100000)).cast("long")
      def le16(x: org.apache.spark.sql.Column) = {
        val hx = lpad(hex(x), 4, "0")
        concat(substring(hx, 3, 2), substring(hx, 1, 2))
      }
      def le32(x: org.apache.spark.sql.Column) = {
        val hx = lpad(hex(x), 8, "0")
        concat(substring(hx, 7, 2), substring(hx, 5, 2),
          substring(hx, 3, 2), substring(hx, 1, 2))
      }
      val fmtHex = concat(lit("666D74201000000001" + "00"), // "fmt ", size 16, PCM
        le16(channels), le32(rate), le32(byteRate), le16(bytesPerFrame), le16(bits))
      val listHex = lit("4C49535404000000494E464F") // LIST, size 4, "INFO"
      val dataHex = concat(lit("64617461"), le32(dataBytes))
      val payload = unhex(concat(
        lit("524946460000000057415645"), // RIFF <size ignored> WAVE
        when(pmod(id, lit(2)) === 0, listHex).otherwise(lit("")),
        fmtHex, dataHex))
      Tables(s, dir, "documents")
        .select(id, AudioMeta(payload).as("m"))
        .select(id, col("m.codec"), col("m.channels"), col("m.sample_rate"),
          col("m.bits"), col("m.duration_ms"))
        .orderBy("doc_id")
    },

    // Real ISO-BMFF/MP4 box-walk parse, completing the image/audio/video
    // triple: valid containers synthesized in-query from doc_id — even ids
    // use version-0 mvhd/tkhd layouts, odd ids version-1 (64-bit times),
    // so both parse paths are exercised — then parsed back by the
    // codegen'd VideoMeta expression; oracle computes expected fields
    // independently. Timescale is 1000, so duration_ms == mvhd duration.
    "q_video_headers" -> { (s, dir) =>
      val id = col("doc_id")
      val w = (lit(160) + pmod(id * 7, lit(1760))).cast("int")
      val h = (lit(90) + pmod(id * 13, lit(990))).cast("int")
      val dur = pmod((id + 1) * 471, lit(7200000)).cast("long")
      def zeros(n: Int) = "0" * n
      val matrix = "00010000" + zeros(24) + "00010000" + zeros(24) + "40000000"
      val mvhdTail = "00010000" + "01000000" + zeros(16) + matrix + zeros(48) + "00000002"
      val mvhdV0 = concat(
        lit("0000006C6D76686400000000" + zeros(16) + "000003E8"),
        lpad(hex(dur), 8, "0"), lit(mvhdTail))
      val mvhdV1 = concat(
        lit("000000786D76686401000000" + zeros(32) + "000003E8"),
        lpad(hex(dur), 16, "0"), lit(mvhdTail))
      val dims = concat(lpad(hex(w), 4, "0"), lit("0000"),
        lpad(hex(h), 4, "0"), lit("0000"))
      val tkhdV0 = concat(
        lit("0000005C746B686400000003" + zeros(16) + "00000001" + zeros(48) + matrix), dims)
      val tkhdV1 = concat(
        lit("00000068746B686401000003" + zeros(32) + "00000001" + zeros(56) + matrix), dims)
      val moovV0 = concat(lit("000000D86D6F6F76"), mvhdV0, lit("000000647472616B"), tkhdV0)
      val moovV1 = concat(lit("000000F06D6F6F76"), mvhdV1, lit("000000707472616B"), tkhdV1)
      val payload = unhex(concat(
        lit("000000106674797069736F6D00000000"),
        when(pmod(id, lit(2)) === 0, moovV0).otherwise(moovV1)))
      Tables(s, dir, "documents")
        .select(id, VideoMeta(payload).as("m"))
        .select(id, col("m.brand"), col("m.width"), col("m.height"), col("m.duration_ms"))
        .orderBy("doc_id")
    },

    // Route/classify over a MIXED-modality corpus: every payload runs
    // through all three header parsers in one projection — the 100 TB
    // "cheap classify before any expensive decode" stage — and
    // unrecognized payloads fall through as text. Mix synthesized
    // in-query by doc_id % 4 (PNG / WAV / MP4 / tagged raw text; the
    // "TXT:" prefix guarantees the text branch can't collide with any
    // container magic). Oracle derives type and fields independently.
    // Corrupt-media rate report — the REJECT leg of route-then-decode:
    // payloads truncated in flight (synthesized: every 5th doc keeps only
    // its first 6 bytes) must be REJECTED by the header parsers, never
    // crash them, and the per-modality corrupt rate is the intake metric
    // an ingest pipeline alarms on. The Spark side derives ok/corrupt
    // from the ACTUAL parsers; the oracle from the truncation rule alone
    // — hash-match proves the parsers reject exactly the truncated
    // payloads (and the tagged-text fallback survives truncation). One
    // map-side projection + a 4-row aggregate.
    "q_media_quality" -> { (s, dir) =>
      val id = col("doc_id")
      val kind = pmod(id, lit(4))
      val full = mediaMixPayload
      val payload = when(pmod(id, lit(5)) === 0, substring(full, 1, 6))
        .otherwise(full)
      val ok = when(kind === 0, ImageMeta(payload).isNotNull)
        .when(kind === 1, AudioMeta(payload).isNotNull)
        .when(kind === 2, VideoMeta(payload).isNotNull)
        .otherwise(substring(payload, 1, 4) === lit("TXT:").cast("binary"))
      Tables(s, dir, "documents")
        .select(
          when(kind === 0, "image").when(kind === 1, "audio")
            .when(kind === 2, "video").otherwise("text").as("expected_kind"),
          ok.cast("long").as("ok"))
        .groupBy("expected_kind")
        .agg(count(lit(1)).as("n_docs"), sum(col("ok")).as("n_ok"))
        .select(col("expected_kind"), col("n_docs"), col("n_ok"),
          expr("(n_docs - n_ok) * 1000000 div n_docs").as("corrupt_ppm"))
        .orderBy("expected_kind")
    },

    "q_media_route" -> { (s, dir) =>
      val id = col("doc_id")
      val payload = mediaMixPayload
      val img = ImageMeta(payload)
      val aud = AudioMeta(payload)
      val vid = VideoMeta(payload)
      Tables(s, dir, "documents")
        .select(id,
          when(img.isNotNull, lit("image"))
            .when(aud.isNotNull, lit("audio"))
            .when(vid.isNotNull, lit("video"))
            .otherwise(lit("text")).as("media_type"),
          coalesce(img.getField("width"), vid.getField("width")).as("width"),
          coalesce(img.getField("height"), vid.getField("height")).as("height"),
          coalesce(aud.getField("duration_ms"), vid.getField("duration_ms"))
            .as("duration_ms"))
        .orderBy("doc_id")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_doc_stats" ->
      """SELECT doc_id,
        | CAST(len(text) AS BIGINT) AS n_chars_calc,
        | CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS BIGINT) AS n_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_bpe,
        | CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST((len(' '||text||' ') - len(replace(' '||text||' ', ' the ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' and ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' of ', ''))) // 4
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct
        | FROM documents)
        |SELECT doc_id,
        | CAST(floor((least(1.0, chars/500.0)*0.3
        |   + least(1.0, stops*10.0/tokens)*0.4
        |   + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_langid" ->
      """WITH t AS (
        | SELECT doc_id, lang, ' '||text||' ' AS p FROM documents),
        |s AS (
        | SELECT doc_id, lang,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5 + (len(p)-len(replace(p,' of ','')))//4 AS s_en,
        |  (len(p)-len(replace(p,' der ','')))//5 + (len(p)-len(replace(p,' und ','')))//5 + (len(p)-len(replace(p,' die ','')))//5 AS s_de,
        |  (len(p)-len(replace(p,' le ','')))//4 + (len(p)-len(replace(p,' et ','')))//4 + (len(p)-len(replace(p,' la ','')))//4 AS s_fr,
        |  (len(p)-len(replace(p,' el ','')))//4 + (len(p)-len(replace(p,' y ','')))//3 + (len(p)-len(replace(p,' los ','')))//5 AS s_es
        | FROM t)
        |SELECT doc_id, lang,
        | CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |      WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |      WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |      WHEN s_es > 0 THEN 'es'
        |      ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_lang_confusion" ->
      """WITH t AS (
        | SELECT doc_id, lang, ' '||text||' ' AS p FROM documents),
        |s AS (
        | SELECT doc_id, lang,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5 + (len(p)-len(replace(p,' of ','')))//4 AS s_en,
        |  (len(p)-len(replace(p,' der ','')))//5 + (len(p)-len(replace(p,' und ','')))//5 + (len(p)-len(replace(p,' die ','')))//5 AS s_de,
        |  (len(p)-len(replace(p,' le ','')))//4 + (len(p)-len(replace(p,' et ','')))//4 + (len(p)-len(replace(p,' la ','')))//4 AS s_fr,
        |  (len(p)-len(replace(p,' el ','')))//4 + (len(p)-len(replace(p,' y ','')))//3 + (len(p)-len(replace(p,' los ','')))//5 AS s_es
        | FROM t),
        |pr AS (
        | SELECT lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        | FROM s),
        |g AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pr GROUP BY 1, 2)
        |SELECT lang, lang_pred, n,
        |  CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS label_total,
        |  n * 1000000 // CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS cell_ppm
        |FROM g ORDER BY lang, lang_pred""".stripMargin,

    "q_token_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        | CAST(SUM(CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT) AS total_tokens,
        | CAST(SUM(CAST(len(text) AS BIGINT)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_repetition" ->
      """WITH g AS (
        | SELECT doc_id, unnest(list_transform(range(1, greatest(len(text)-2, 1)+1),
        |   i -> text[i:i+2])) AS g
        | FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id,
        | (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT) AS rep_ppm
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // md5 over the substring is the proven cross-engine digest; substr
    // is character-based on both; interval-merge windows mirror the
    // operator (windowed MAX is frame-exact, windowed SUM CAST per the
    // HUGEINT rule)
    "q_substring_dup" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE len(text) >= 50),
        |pos AS (SELECT doc_id, unnest(range(1, len(text) - 49 + 1)) AS p FROM d),
        |g AS (SELECT pos.doc_id, p, md5(substr(d.text, p, 50)) AS gm
        |      FROM pos JOIN d ON pos.doc_id = d.doc_id),
        |dup AS (SELECT doc_id, p FROM (
        |  SELECT doc_id, p, COUNT(*) OVER (PARTITION BY gm) AS c FROM g) WHERE c > 1),
        |f AS (SELECT doc_id, p,
        |        MAX(p + 49) OVER (PARTITION BY doc_id ORDER BY p
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |      FROM dup),
        |sflag AS (SELECT doc_id, p,
        |            CASE WHEN prev_end IS NULL OR p > prev_end + 1 THEN 1 ELSE 0 END AS new_span
        |          FROM f),
        |sid AS (SELECT doc_id, p,
        |          CAST(SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS span_id
        |        FROM sflag),
        |spans AS (SELECT doc_id, span_id, MIN(p) AS s, MAX(p) + 49 AS e
        |          FROM sid GROUP BY 1, 2)
        |SELECT doc_id, COUNT(*) AS n_dup_spans,
        | CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars
        |FROM spans GROUP BY 1 ORDER BY 1""".stripMargin,

    // same tokenizer as q_vocab/q_tfidf; string_agg skips the NULLs the
    // rn>20 tail leaves, ORDER BY doc_id matches sort_array ascending;
    // CAST(doc_id AS VARCHAR) = Spark's long->string cast for integers
    "q_postings" ->
      """WITH t AS (
        | SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS token
        | FROM documents),
        |p AS (SELECT DISTINCT doc_id, token FROM t WHERE len(token) >= 3),
        |r AS (SELECT token, doc_id,
        |        ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn
        |      FROM p)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
        | string_agg(CASE WHEN rn <= 20 THEN CAST(doc_id AS VARCHAR) END, ','
        |            ORDER BY doc_id) AS postings_head
        |FROM r GROUP BY token
        |ORDER BY df DESC, token
        |LIMIT 200""".stripMargin,

    "q_vocab" ->
      """SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        | CAST(COUNT(*) AS BIGINT) AS n_occurrences
        |FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY n_occurrences DESC, n_docs DESC, token
        |LIMIT 100""".stripMargin,

    // same tokenizer regex as the Spark side ('[a-z]+' is identical in
    // Java regex and RE2); every arithmetic step is BIGINT floor division
    "q_tfidf_terms" ->
      """WITH t AS (
        | SELECT doc_id, source, unnest(regexp_extract_all(text, '[a-z]+')) AS token
        | FROM documents),
        |f AS (SELECT * FROM t WHERE len(token) >= 3),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |       FROM f GROUP BY token),
        |tf AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM f GROUP BY source, token),
        |s AS (SELECT source, tf.token AS token, tf, df,
        |        CAST(tf * ((n * 1000000) // df) AS BIGINT) AS score_ppm
        |      FROM tf JOIN df USING (token), n),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY score_ppm DESC, token) AS INT) AS rnk FROM s)
        |SELECT source, rnk, token, tf, df, score_ppm
        |FROM r WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin,

    // terminator-run counting and floor division are engine-identical;
    // len() of the regexp_extract_all list mirrors size()
    "q_sentence_stats" ->
      """WITH t AS (
        | SELECT doc_id, CAST(len(text) AS BIGINT) AS chars,
        |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS nt
        | FROM documents)
        |SELECT doc_id, greatest(nt, 1) AS n_sentences,
        | chars // greatest(nt, 1) AS chars_per_sentence
        |FROM t ORDER BY doc_id""".stripMargin,

    // vocab = DISTINCT post-unnest rows; jaccard is pure BIGINT floor math
    "q_source_overlap" ->
      """WITH v AS (
        | SELECT source, unnest(regexp_extract_all(text, '[a-z]+')) AS token
        | FROM documents),
        |f AS (SELECT DISTINCT source, token FROM v WHERE len(token) >= 3),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY source),
        |i AS (SELECT a.source AS src_a, b.source AS src_b,
        |        CAST(COUNT(*) AS BIGINT) AS n_shared
        |      FROM f a JOIN f b ON a.token = b.token AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared, x.n AS n_a, y.n AS n_b,
        | CAST((n_shared * 1000000) // (x.n + y.n - n_shared) AS BIGINT) AS jacc_ppm
        |FROM i JOIN sz x ON i.src_a = x.source JOIN sz y ON i.src_b = y.source
        |ORDER BY src_a, src_b""".stripMargin,

    // parity split mirrored; COUNT is BIGINT, the SUM totals get the
    // CAST (HUGEINT rule), ppm multiply stays BIGINT; empty-side guard
    // mirrored with greatest(total, 1)
    "q_token_drift" ->
      """WITH oc AS (
        | SELECT unnest(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS token
        | FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
        |ocnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS old_n FROM oc GROUP BY 1),
        |nc AS (
        | SELECT unnest(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS token
        | FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1),
        |ncnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS new_n FROM nc GROUP BY 1),
        |ot AS (SELECT greatest(CAST(SUM(old_n) AS BIGINT), 1) AS old_total FROM ocnt),
        |nt AS (SELECT greatest(CAST(SUM(new_n) AS BIGINT), 1) AS new_total FROM ncnt),
        |j AS (
        | SELECT COALESCE(ocnt.token, ncnt.token) AS token,
        |  COALESCE(old_n, 0) AS old_n, COALESCE(new_n, 0) AS new_n
        | FROM ocnt FULL JOIN ncnt ON ocnt.token = ncnt.token)
        |SELECT token, old_n, new_n,
        | (old_n * 1000000) // old_total AS old_ppm,
        | (new_n * 1000000) // new_total AS new_ppm,
        | (new_n * 1000000) // new_total - (old_n * 1000000) // old_total AS delta_ppm
        |FROM j, ot, nt WHERE old_n + new_n >= 50 ORDER BY token""".stripMargin,

    "q_corpus_split" ->
      """SELECT source,
        | CASE WHEN (doc_id % 2147483648 * 2654435761) % 1000 < 900 THEN 'train'
        |      WHEN (doc_id % 2147483648 * 2654435761) % 1000 < 950 THEN 'val'
        |      ELSE 'test' END AS split,
        | COUNT(*) AS n_docs,
        | CAST(SUM(CAST(len(text) AS BIGINT)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_split_leakage" ->
      """WITH d AS (
        |  SELECT CASE WHEN (doc_id % 2147483648 * 2654435761) % 1000 < 900 THEN 'train'
        |              WHEN (doc_id % 2147483648 * 2654435761) % 1000 < 950 THEN 'val'
        |              ELSE 'test' END AS split,
        |         md5(text) AS digest, CAST(len(text) AS BIGINT) AS n_chars
        |  FROM documents WHERE text IS NOT NULL),
        |tr AS (SELECT DISTINCT digest FROM d WHERE split = 'train'),
        |ho AS (SELECT split, digest, n_chars FROM d WHERE split <> 'train'),
        |tot AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs FROM ho GROUP BY split),
        |lk AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_leaked,
        |         CAST(SUM(n_chars) AS BIGINT) AS leaked_chars
        |       FROM ho WHERE digest IN (SELECT digest FROM tr) GROUP BY split)
        |SELECT t.split, t.n_docs,
        |  COALESCE(l.n_leaked, 0) AS n_leaked,
        |  COALESCE(l.leaked_chars, 0) AS leaked_chars,
        |  COALESCE(l.n_leaked, 0) * 1000000 // t.n_docs AS leak_ppm
        |FROM tot t LEFT JOIN lk l USING (split) ORDER BY split""".stripMargin,

    // Knuth hash-order rank mirrored (the q_corpus_split formula with the
    // epoch shift); ROW_NUMBER is BIGINT in DuckDB, Spark's is cast
    "q_epoch_order" ->
      """SELECT doc_id,
        | CAST(ROW_NUMBER() OVER (ORDER BY
        |   ((doc_id + 1000003) % 2147483648 * 2654435761) % 2147483647, doc_id)
        |  AS BIGINT) AS epoch_rank
        |FROM documents ORDER BY doc_id""".stripMargin,

    // per-source ROW_NUMBER over the epoch-shifted Knuth hash order
    // (q_epoch_order's proven formula, partitioned); weights derived
    // from the source name on both engines
    "q_interleave_order" ->
      """SELECT doc_id, source,
        | CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |   ((doc_id + 1000003) % 2147483648 * 2654435761) % 2147483647, doc_id)
        |  AS BIGINT) AS src_rank,
        | (CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY
        |   ((doc_id + 1000003) % 2147483648 * 2654435761) % 2147483647, doc_id)
        |  AS BIGINT) * 1000000)
        |  // greatest((1 + len(source) % 3) * 1000000, 1) AS interleave_key
        |FROM documents ORDER BY doc_id""".stripMargin,

    // rank CTE = q_epoch_order's proven oracle; token sums CAST (HUGEINT
    // rule); null-text docs keep their rank, contribute no tokens
    "q_shard_manifest" ->
      """WITH r AS (
        | SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
        |  ROW_NUMBER() OVER (ORDER BY
        |    ((doc_id + 1000003) % 2147483648 * 2654435761) % 2147483647, doc_id) AS rk
        | FROM documents)
        |SELECT CAST((rk - 1) % 8 AS BIGINT) AS shard, COUNT(*) AS n_docs,
        | CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        | FROM documents)
        |SELECT doc_id, source, n_tokens,
        | CAST((CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens)
        |   // 512 AS BIGINT) AS pack_id
        |FROM t ORDER BY doc_id""".stripMargin,

    // cumsum CTE = q_pack_sequences' proven oracle shape (windowed SUM
    // CAST per the HUGEINT rule); spill = tokens past the doc's first
    // 512-boundary; zero-token docs are non-spanning by the CASE
    "q_pack_spill" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n
        | FROM documents WHERE text IS NOT NULL),
        |c AS (
        | SELECT doc_id, source, n,
        |  CAST(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM t),
        |s AS (
        | SELECT source, n, cum, (cum - n) // 512 AS sp,
        |  CASE WHEN n > 0 THEN (cum - 1) // 512 ELSE (cum - n) // 512 END AS ep
        | FROM c)
        |SELECT source, COUNT(*) AS n_docs,
        | CAST(SUM(CASE WHEN ep > sp THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning_docs,
        | CAST(SUM(CASE WHEN ep > sp THEN cum - (sp + 1) * 512 ELSE 0 END) AS BIGINT) AS spilled_tokens,
        | (CAST(SUM(CASE WHEN ep > sp THEN cum - (sp + 1) * 512 ELSE 0 END) AS BIGINT) * 1000000)
        |   // greatest(CAST(SUM(n) AS BIGINT), 1) AS spill_ppm
        |FROM s GROUP BY source ORDER BY source""".stripMargin,

    // pack assignment CTE identical to q_pack_sequences' proven oracle;
    // ids zero-padded so the string sort matches sort_array exactly
    "q_pack_manifest" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        | FROM documents),
        |p AS (
        | SELECT doc_id, source, n_tokens,
        |  CAST((CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens)
        |    // 512 AS BIGINT) AS pack_id
        | FROM t)
        |SELECT source, pack_id, COUNT(*) AS n_docs,
        | CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
        | string_agg(lpad(CAST(doc_id AS VARCHAR), 6, '0'), ','
        |   ORDER BY lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS ids
        |FROM p GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin,

    "q_length_histogram" ->
      """SELECT source, len(text) // 100 AS bucket, COUNT(*) AS n_docs,
        | CAST(SUM(len(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_pipeline_e2e" ->
      """WITH t AS (
        | SELECT doc_id, text, ' '||text||' ' AS p,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
        |  md5(text) AS digest
        | FROM documents),
        |s AS (
        | SELECT doc_id, digest, n_tokens, chars, tokens, punct,
        |  CAST((len(p) - len(replace(p, ' the ', ''))) // 5
        |     + (len(p) - len(replace(p, ' and ', ''))) // 5
        |     + (len(p) - len(replace(p, ' of ', ''))) // 4
        |     + (len(p) - len(replace(p, ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5 + (len(p)-len(replace(p,' of ','')))//4 AS s_en,
        |  (len(p)-len(replace(p,' der ','')))//5 + (len(p)-len(replace(p,' und ','')))//5 + (len(p)-len(replace(p,' die ','')))//5 AS s_de,
        |  (len(p)-len(replace(p,' le ','')))//4 + (len(p)-len(replace(p,' et ','')))//4 + (len(p)-len(replace(p,' la ','')))//4 AS s_fr,
        |  (len(p)-len(replace(p,' el ','')))//4 + (len(p)-len(replace(p,' y ','')))//3 + (len(p)-len(replace(p,' los ','')))//5 AS s_es
        | FROM t),
        |g AS (
        | SELECT doc_id, digest, n_tokens,
        |  CAST(floor((least(1.0, chars/500.0)*0.3
        |    + least(1.0, stops*10.0/tokens)*0.4
        |    + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS q,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred
        | FROM s),
        |f AS (SELECT * FROM g WHERE q >= 400000 AND lang_pred <> 'und'),
        |k AS (SELECT digest, MIN(doc_id) AS doc_id FROM f GROUP BY 1),
        |kept AS (SELECT f.* FROM f JOIN k USING (digest, doc_id)),
        |sp AS (SELECT *, CASE WHEN (doc_id % 2147483648 * 2654435761)%1000 < 900 THEN 'train'
        |                     WHEN (doc_id % 2147483648 * 2654435761)%1000 < 950 THEN 'val'
        |                     ELSE 'test' END AS split FROM kept)
        |SELECT split, lang_pred, COUNT(*) AS n_docs,
        | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_mix_weights" ->
      """WITH s AS (
        | SELECT source,
        |  CAST(SUM(CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS n FROM s)
        |SELECT source, n_tokens,
        | CAST(CASE WHEN ((total // n) // greatest(n_tokens, 1)) > 1000 THEN 1000000000
        |  ELSE least(
        |   ((total // n) // greatest(n_tokens, 1)) * 1000000
        |    + (CASE WHEN greatest(n_tokens, 1) > 9223372036854
        |       THEN ((((total // n) % greatest(n_tokens, 1)) // 1048576) * 1000000)
        |            // (greatest(n_tokens, 1) // 1048576)
        |       ELSE (((total // n) % greatest(n_tokens, 1)) * 1000000) // greatest(n_tokens, 1) END),
        |   1000000000) END AS BIGINT) AS weight_ppm
        |FROM s, t ORDER BY source""".stripMargin,

    "q_contamination" ->
      """WITH evalg AS (
        | SELECT DISTINCT unnest(list_distinct(list_transform(
        |   range(1, greatest(len(text)-7, 1)+1), i -> text[i:i+7]))) AS g
        | FROM documents WHERE source = 'src0'),
        |traing AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(
        |   range(1, greatest(len(text)-7, 1)+1), i -> text[i:i+7]))) AS g
        | FROM documents WHERE source <> 'src0')
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        |FROM traing JOIN evalg USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // q_contamination's shingle CTEs carried to the pair grain; the
    // rare-gram cap (df <= 10 over eval docs) and the row_number tie
    // rule (count DESC, train_id ASC) repeated verbatim
    "q_provenance" ->
      """WITH evalg0 AS (
        | SELECT doc_id AS eval_id, unnest(list_distinct(list_transform(
        |   range(1, greatest(len(text)-7, 1)+1), i -> text[i:i+7]))) AS g
        | FROM documents WHERE source = 'src0'),
        |rare AS (SELECT g FROM evalg0 GROUP BY g HAVING COUNT(*) <= 10),
        |evalg AS (SELECT eval_id, g FROM evalg0 JOIN rare USING (g)),
        |traing AS (
        | SELECT doc_id AS train_id, unnest(list_distinct(list_transform(
        |   range(1, greatest(len(text)-7, 1)+1), i -> text[i:i+7]))) AS g
        | FROM documents WHERE source <> 'src0'),
        |p AS (
        | SELECT eval_id, train_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        | FROM traing JOIN evalg USING (g) GROUP BY 1, 2),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY eval_id
        |        ORDER BY n_shared_grams DESC, train_id) AS BIGINT) AS rnk
        |      FROM p)
        |SELECT eval_id, train_id, n_shared_grams, rnk FROM r WHERE rnk <= 3
        |ORDER BY eval_id, rnk""".stripMargin,

    // same packed-shingle CTE as q_dedup_ngram; containment denominator =
    // least(); floor division mirrored; threshold repeated verbatim;
    // IS NOT DISTINCT FROM mirrors the Spark side's null-safe <=> block
    // join (NULL lang is a real block on both engines)
    "q_containment" ->
      """WITH s AS (
        | SELECT doc_id, lang,
        |  list_distinct(list_transform(range(1, greatest(len(text)-2,1)+1),
        |    i -> CAST(ascii(text[i:i]) AS BIGINT)*65536
        |       + CAST(ascii(text[i+1:i+1]) AS BIGINT)*256
        |       + CAST(ascii(text[i+2:i+2]) AS BIGINT))) AS sh
        | FROM documents)
        |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
        | CAST(len(list_intersect(a.sh, b.sh)) * 1000000
        |   // greatest(least(len(a.sh), len(b.sh)), 1) AS BIGINT) AS cont_ppm
        |FROM s a JOIN s b
        | ON a.lang IS NOT DISTINCT FROM b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) * 1000000
        |   // greatest(least(len(a.sh), len(b.sh)), 1) AS BIGINT) >= 900000
        |ORDER BY doc1, doc2""".stripMargin,

    // bigrams = list_transform over 1-based positions (mirrors the
    // adjacent_join kernel); every floor division parenthesized
    // identically to the Spark expr; counts CAST per the HUGEINT rule
    "q_ngram_colloc" ->
      """WITH t AS (
        | SELECT regexp_extract_all(text, '[a-z]+') AS toks FROM documents),
        |uc AS (
        | SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        | FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM uc),
        |bc AS (
        | SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_xy
        | FROM (SELECT unnest(list_transform(range(1, len(toks)),
        |         i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t)
        | GROUP BY 1),
        |top AS (SELECT bigram, c_xy FROM bc ORDER BY c_xy DESC, bigram LIMIT 30)
        |SELECT top.bigram, top.c_xy, u1.c AS c_x, u2.c AS c_y,
        | (((1000000 * top.c_xy) // u1.c) * (SELECT nn FROM n)) // u2.c AS lift_ppm
        |FROM top
        |JOIN uc u1 ON split_part(top.bigram, ' ', 1) = u1.w
        |JOIN uc u2 ON split_part(top.bigram, ' ', 2) = u2.w
        |ORDER BY top.c_xy DESC, top.bigram""".stripMargin,

    // every division is floor over positives and mirrored; SUM wrapped
    // per the HUGEINT rule; docs with <2 word tokens absent by
    // construction (range(1, len) is empty) on both engines
    "q_lm_score" ->
      """WITH toks AS (
        | SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ts
        | FROM documents WHERE text IS NOT NULL),
        |pairs AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |   i -> ts[i] || ' ' || ts[i+1])) AS pair
        | FROM toks),
        |c2 AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c2 FROM pairs GROUP BY 1),
        |c1 AS (SELECT split_part(pair, ' ', 1) AS w1, CAST(SUM(c2) AS BIGINT) AS c1
        |       FROM c2 GROUP BY 1),
        |model AS (SELECT pair, (c2 * 1000000) // c1 AS p_ppm
        |          FROM c2 JOIN c1 ON split_part(c2.pair, ' ', 1) = c1.w1),
        |scored AS (SELECT p.doc_id, m.p_ppm FROM pairs p JOIN model m USING (pair))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        | CAST(SUM(p_ppm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS lm_avg_ppm,
        | CAST(MIN(p_ppm) AS BIGINT) AS lm_min_ppm
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // quality CTE = q_quality's proven oracle restricted to non-null
    // text; SUM(len) CAST (HUGEINT rule), floor-div mean and dup ppm
    "q_quality_calibration" ->
      """WITH t AS (
        | SELECT doc_id, text,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST((len(' '||text||' ') - len(replace(' '||text||' ', ' the ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' and ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' of ', ''))) // 4
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct
        | FROM documents WHERE text IS NOT NULL),
        |q AS (
        | SELECT doc_id, text,
        |  CAST(floor((least(1.0, chars/500.0)*0.3
        |    + least(1.0, stops*10.0/tokens)*0.4
        |    + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS qp
        | FROM t)
        |SELECT qp // 100000 AS quality_bucket,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(len(text)) AS BIGINT) // COUNT(*) AS mean_chars,
        | ((COUNT(*) - COUNT(DISTINCT md5(text))) * 1000000) // COUNT(*) AS dup_ppm
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,

    // counts derived INDEPENDENTLY from the residue classes (valid
    // because the base corpus is verified clean ASCII — any operator
    // regex bug hash-mismatches); BEL is ASCII so only classes 1/3
    // subtract from the ascii char mass
    "q_encoding_report" ->
      """WITH raw AS (
        | SELECT doc_id, source,
        |  text || CASE CAST(doc_id % 4 AS INT)
        |    WHEN 1 THEN chr(65533)
        |    WHEN 2 THEN chr(7)
        |    WHEN 3 THEN ' caf' || chr(233)
        |    ELSE '' END AS raw
        | FROM documents WHERE text IS NOT NULL)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake_docs,
        | CAST(SUM(CASE WHEN doc_id % 4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl_docs,
        | CAST(SUM(CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 0 END) AS BIGINT) AS n_nonascii_docs,
        | (CAST(SUM(len(raw) - CASE WHEN doc_id % 4 IN (1, 3) THEN 1 ELSE 0 END) AS BIGINT)
        |   * 1000000) // greatest(CAST(SUM(len(raw)) AS BIGINT), 1) AS ascii_ppm
        |FROM raw GROUP BY source ORDER BY source""".stripMargin,

    // q_lm_score's proven model CTEs restricted to the even-doc
    // reference; LEFT JOIN + COALESCE(p_ppm, 0) mirrors the unseen rule
    "q_lm_cross_score" ->
      """WITH rt AS (
        | SELECT regexp_extract_all(text, '[a-z]+') AS ts
        | FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 0),
        |rp AS (
        | SELECT unnest(list_transform(range(1, len(ts)),
        |   i -> ts[i] || ' ' || ts[i+1])) AS pair
        | FROM rt),
        |c2 AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c2 FROM rp GROUP BY 1),
        |c1 AS (SELECT split_part(pair, ' ', 1) AS w1, CAST(SUM(c2) AS BIGINT) AS c1
        |       FROM c2 GROUP BY 1),
        |model AS (SELECT pair, (c2 * 1000000) // c1 AS p_ppm
        |          FROM c2 JOIN c1 ON split_part(c2.pair, ' ', 1) = c1.w1),
        |tt AS (
        | SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS ts
        | FROM documents WHERE text IS NOT NULL AND doc_id % 2 = 1),
        |tp AS (
        | SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |   i -> ts[i] || ' ' || ts[i+1])) AS pair
        | FROM tt),
        |scored AS (SELECT p.doc_id, m.p_ppm
        |           FROM tp p LEFT JOIN model m USING (pair))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        | CAST(SUM(CASE WHEN p_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
        | CAST(SUM(COALESCE(p_ppm, 0)) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS lm_avg_ppm,
        | CAST(MIN(COALESCE(p_ppm, 0)) AS BIGINT) AS lm_min_ppm
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the bloom prefilter must be invisible in the result: the oracle is
    // exactly q_contamination's (false positives die in the verify join)
    "q_contamination_bloom" ->
      """WITH evalg AS (
        | SELECT DISTINCT unnest(list_distinct(list_transform(
        |   range(1, greatest(len(text)-7, 1)+1), i -> text[i:i+7]))) AS g
        | FROM documents WHERE source = 'src0'),
        |traing AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(
        |   range(1, greatest(len(text)-7, 1)+1), i -> text[i:i+7]))) AS g
        | FROM documents WHERE source <> 'src0')
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
        |FROM traing JOIN evalg USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, substr(md5(text), 1, 16) AS fp,
        | list_min(list_transform(range(1, greatest(len(text)-7, 1)+1), i -> md5(text[i:i+7]))) AS shingle_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Union of the proven per-signal fragments; rep joined LEFT so a
    // null-text doc keeps its row with null signals (the Spark side is
    // null-propagating except lang_pred → 'und', mirrored by the CASE).
    "q_doc_profile" ->
      """WITH g AS (
        | SELECT doc_id, unnest(list_transform(range(1, greatest(len(text)-2, 1)+1),
        |   i -> text[i:i+2])) AS g
        | FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
        |rep AS (
        | SELECT doc_id,
        |  (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT) AS rep_ppm
        | FROM c GROUP BY doc_id),
        |t AS (
        | SELECT doc_id, text, ' '||text||' ' AS p,
        |  CAST(len(text) AS BIGINT) AS n_chars_calc,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_bpe,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
        | FROM documents),
        |s AS (
        | SELECT *,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5 + (len(p)-len(replace(p,' of ','')))//4 AS s_en,
        |  (len(p)-len(replace(p,' der ','')))//5 + (len(p)-len(replace(p,' und ','')))//5 + (len(p)-len(replace(p,' die ','')))//5 AS s_de,
        |  (len(p)-len(replace(p,' le ','')))//4 + (len(p)-len(replace(p,' et ','')))//4 + (len(p)-len(replace(p,' la ','')))//4 AS s_fr,
        |  (len(p)-len(replace(p,' el ','')))//4 + (len(p)-len(replace(p,' y ','')))//3 + (len(p)-len(replace(p,' los ','')))//5 AS s_es,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5
        |    + (len(p)-len(replace(p,' of ','')))//4 + (len(p)-len(replace(p,' a ','')))//3 AS stops
        | FROM t)
        |SELECT s.doc_id, n_chars_calc, n_tokens, n_tokens_bpe, n_punct,
        | CAST(floor((least(1.0, CAST(n_chars_calc AS DOUBLE)/500.0)*0.3
        |   + least(1.0, CAST(stops AS DOUBLE)*10.0/CAST(n_tokens AS DOUBLE))*0.4
        |   + (1.0 - least(1.0, CAST(n_punct AS DOUBLE)/(CAST(n_chars_calc AS DOUBLE)*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm,
        | CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |      WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |      WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |      WHEN s_es > 0 THEN 'es'
        |      ELSE 'und' END AS lang_pred,
        | rep.rep_ppm,
        | substr(md5(text), 1, 16) AS fp,
        | list_min(list_transform(range(1, greatest(len(text)-7, 1)+1), i -> md5(text[i:i+7]))) AS shingle_fp
        |FROM s LEFT JOIN rep ON s.doc_id = rep.doc_id
        |ORDER BY s.doc_id""".stripMargin,

    // weights CTE identical to q_mix_weights' proven oracle; multiplicity
    // = floor epochs + Knuth-hash fractional copy (same hash as the
    // corpus-split oracle)
    "q_mix_apply" ->
      """WITH d AS (
        | SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        | FROM documents),
        |s AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS n FROM s),
        |w AS (
        | SELECT source,
        |  CAST(CASE WHEN ((total // n) // greatest(n_tokens, 1)) > 1000 THEN 1000000000
        |   ELSE least(
        |    ((total // n) // greatest(n_tokens, 1)) * 1000000
        |     + (CASE WHEN greatest(n_tokens, 1) > 9223372036854
        |        THEN ((((total // n) % greatest(n_tokens, 1)) // 1048576) * 1000000)
        |             // (greatest(n_tokens, 1) // 1048576)
        |        ELSE (((total // n) % greatest(n_tokens, 1)) * 1000000) // greatest(n_tokens, 1) END),
        |    1000000000) END AS BIGINT) AS weight_ppm
        | FROM s, t),
        |m AS (
        | SELECT d.doc_id, d.source, d.n_tokens,
        |  CAST(w.weight_ppm // 1000000 +
        |   CASE WHEN (d.doc_id % 2147483648 * 2654435761) % 1000000 < w.weight_ppm % 1000000
        |        THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        | FROM d JOIN w USING (source))
        |SELECT source, COUNT(*) AS n_docs,
        | CAST(SUM(CASE WHEN n_copies > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(SUM(n_copies) AS BIGINT) AS total_copies,
        | CAST(SUM(n_tokens * n_copies) AS BIGINT) AS tokens_out
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // stride arithmetic mirrored exactly; md5 verifies chunk CONTENT
    // (substring semantics are 1-based char-counted on both engines)
    "q_chunk_docs" ->
      """WITH d AS (
        | SELECT doc_id, text, len(text) AS l FROM documents WHERE text IS NOT NULL),
        |n AS (
        | SELECT doc_id, text,
        |  CAST(CASE WHEN l <= 128 THEN 1 ELSE 1 + (l - 128 + 95) // 96 END AS BIGINT) AS n_chunks
        | FROM d),
        |c AS (
        | SELECT doc_id, n_chunks, unnest(range(0, n_chunks)) AS chunk_id, text FROM n)
        |SELECT doc_id, chunk_id, n_chunks,
        | CAST(len(substring(text, CAST(chunk_id * 96 + 1 AS INT), 128)) AS BIGINT) AS chunk_chars,
        | md5(substring(text, CAST(chunk_id * 96 + 1 AS INT), 128)) AS digest
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // same Knuth id-hash as the corpus-split oracle; ROW_NUMBER's order
    // is total (hash, then id), so the cut is deterministic
    "q_stratified_sample" ->
      """WITH r AS (
        | SELECT doc_id, source,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |   ORDER BY (doc_id % 2147483648 * 2654435761) % 2147483647, doc_id) AS sample_rank
        | FROM documents)
        |SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM r WHERE sample_rank <= 10 ORDER BY doc_id""".stripMargin,

    // windowed cumsum CAST per the HUGEINT rule; hit counting is pure
    // integer floor division mirrored from the operator
    "q_pps_sample" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents
        |           WHERE n_chars IS NOT NULL AND n_chars > 0),
        |c AS (SELECT doc_id, n_chars,
        |  CAST(SUM(n_chars) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
        |  FROM d),
        |t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM d),
        |p AS (SELECT doc_id, n_chars, cum_end, cum_end - n_chars AS cum_start,
        |        greatest(total // 100, 1) AS step FROM c, t),
        |q AS (SELECT doc_id, n_chars, cum_start, cum_end,
        |  (CASE WHEN cum_end <= step // 2 THEN 0
        |        ELSE (cum_end - 1 - step // 2) // step + 1 END)
        |  - (CASE WHEN cum_start <= step // 2 THEN 0
        |          ELSE (cum_start - 1 - step // 2) // step + 1 END) AS multiplicity
        |  FROM p)
        |SELECT doc_id, n_chars, cum_start, cum_end, multiplicity FROM q
        |WHERE multiplicity > 0 ORDER BY doc_id""".stripMargin,

    // quality CTE identical to q_quality's proven oracle (plus source);
    // the gate keeps rank <= floor(n * keep_ppm / 1e6) per source
    "q_quality_filter" ->
      """WITH t AS (
        | SELECT doc_id, source,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST((len(' '||text||' ') - len(replace(' '||text||' ', ' the ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' and ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' of ', ''))) // 4
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct
        | FROM documents WHERE text IS NOT NULL),
        |q AS (
        | SELECT doc_id, source,
        |  CAST(floor((least(1.0, chars/500.0)*0.3
        |   + least(1.0, stops*10.0/tokens)*0.4
        |   + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm
        | FROM t),
        |r AS (
        | SELECT doc_id, source, quality_ppm,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality_ppm DESC, doc_id) AS rnk,
        |  COUNT(*) OVER (PARTITION BY source) AS n
        | FROM q)
        |SELECT doc_id, source, quality_ppm
        |FROM r WHERE rnk <= (n * 500000) // 1000000 ORDER BY doc_id""".stripMargin,

    // fingerprint CTE identical to the cluster oracle's s_shingle; the
    // incremental rule is keep-min within the batch, then NOT IN seen
    "q_dedup_incremental" ->
      """WITH sig AS (
        | SELECT doc_id, source,
        |  list_min(list_transform(range(1, greatest(len(text)-7, 1)+1),
        |    i -> md5(text[i:i+7]))) AS fp
        | FROM documents WHERE text IS NOT NULL),
        |seen AS (
        | SELECT DISTINCT fp FROM sig
        | WHERE source IN ('src0','src1','src2','src3','src4') AND fp IS NOT NULL),
        |b AS (
        | SELECT doc_id, source, fp FROM sig
        | WHERE source NOT IN ('src0','src1','src2','src3','src4') AND fp IS NOT NULL),
        |k AS (SELECT fp, MIN(doc_id) AS doc_id FROM b GROUP BY 1)
        |SELECT b.doc_id, b.source, b.fp
        |FROM b JOIN k USING (fp, doc_id)
        |WHERE b.fp NOT IN (SELECT fp FROM seen)
        |ORDER BY b.doc_id""".stripMargin,

    // composes the two PROVEN retrieval oracles (q_bm25_search's CTEs and
    // q_knn_brute's cosine chain) and fuses with pure BIGINT floor math;
    // rank orderings are identical across engines because the underlying
    // doubles are bit-identical IEEE chains (q_knn_brute's hash-match)
    "q_hybrid_search" ->
      """WITH tf AS (
        | SELECT doc_id,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' query ', ''))) // 7 AS tf0,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' table ', ''))) // 7 AS tf1,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' stream ', ''))) // 8 AS tf2,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS BIGINT) AS dl
        | FROM documents),
        |d AS (
        | SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total,
        |  CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |  CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |  CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        | FROM tf),
        |bms AS (
        | SELECT doc_id, CAST(
        |    (((n * 1000000) // greatest(df0, 1)) * ((tf0 * 2200000000 * greatest(total // n, 1))
        |      // greatest(tf0 * 1000000 * greatest(total // n, 1) + 1200 * (250 * greatest(total // n, 1) + 750 * dl), 1))) // 1000
        |  + (((n * 1000000) // greatest(df1, 1)) * ((tf1 * 2200000000 * greatest(total // n, 1))
        |      // greatest(tf1 * 1000000 * greatest(total // n, 1) + 1200 * (250 * greatest(total // n, 1) + 750 * dl), 1))) // 1000
        |  + (((n * 1000000) // greatest(df2, 1)) * ((tf2 * 2200000000 * greatest(total // n, 1))
        |      // greatest(tf2 * 1000000 * greatest(total // n, 1) + 1200 * (250 * greatest(total // n, 1) + 750 * dl), 1))) // 1000
        |  AS BIGINT) AS score
        | FROM tf, d ORDER BY score DESC, doc_id LIMIT 20),
        |bm AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bms),
        |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        | SELECT vec_id AS doc_id,
        |  list_sum(list_transform(list_zip(qvec, embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
        |   / sqrt(list_sum(list_transform(list_zip(qvec, qvec), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))))
        |   / sqrt(list_sum(list_transform(list_zip(embedding, embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))) AS sim
        | FROM q, embeddings WHERE vec_id <> 0),
        |cos AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS rnk FROM pairs),
        |u AS (
        | SELECT doc_id, rnk FROM bm
        | UNION ALL
        | SELECT doc_id, rnk FROM cos WHERE rnk <= 20)
        |SELECT doc_id, CAST(SUM(1000000 // (60 + rnk)) AS BIGINT) AS rrf_ppm,
        | CAST(COUNT(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY doc_id ORDER BY rrf_ppm DESC, doc_id LIMIT 10""".stripMargin,

    // same space-padded occurrence primitive as langid; reciprocal-df
    // weights and the top-20 cut are pure integer arithmetic
    "q_keyword_search" ->
      """WITH tf AS (
        | SELECT doc_id,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' query ', ''))) // 7 AS tf0,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' table ', ''))) // 7 AS tf1,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' stream ', ''))) // 8 AS tf2
        | FROM documents),
        |d AS (
        | SELECT COUNT(*) AS n,
        |  SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        | FROM tf)
        |SELECT doc_id,
        | CAST(tf0 * ((n * 1000000) // greatest(df0, 1))
        |    + tf1 * ((n * 1000000) // greatest(df1, 1))
        |    + tf2 * ((n * 1000000) // greatest(df2, 1)) AS BIGINT) AS score
        |FROM tf, d
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // the same tf/df building blocks as q_keyword_search; the BM25
    // normalization is mirrored with every floor division parenthesized
    // identically (den = 0 only when tf = 0, where the numerator is 0)
    "q_bm25_search" ->
      """WITH tf AS (
        | SELECT doc_id,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' query ', ''))) // 7 AS tf0,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' table ', ''))) // 7 AS tf1,
        |  (len(' '||text||' ') - len(replace(' '||text||' ', ' stream ', ''))) // 8 AS tf2,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS BIGINT) AS dl
        | FROM documents),
        |d AS (
        | SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total,
        |  CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |  CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |  CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        | FROM tf)
        |SELECT doc_id, CAST(
        |   (((n * 1000000) // greatest(df0, 1)) * ((tf0 * 2200000000 * greatest(total // n, 1))
        |     // greatest(tf0 * 1000000 * greatest(total // n, 1) + 1200 * (250 * greatest(total // n, 1) + 750 * dl), 1))) // 1000
        | + (((n * 1000000) // greatest(df1, 1)) * ((tf1 * 2200000000 * greatest(total // n, 1))
        |     // greatest(tf1 * 1000000 * greatest(total // n, 1) + 1200 * (250 * greatest(total // n, 1) + 750 * dl), 1))) // 1000
        | + (((n * 1000000) // greatest(df2, 1)) * ((tf2 * 2200000000 * greatest(total // n, 1))
        |     // greatest(tf2 * 1000000 * greatest(total // n, 1) + 1200 * (250 * greatest(total // n, 1) + 750 * dl), 1))) // 1000
        | AS BIGINT) AS score
        |FROM tf, d ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    // mirrors the synthesis and the RE2-identical redaction chain; counts
    // are taken on the text as each rule sees it (post-upstream-redaction)
    "q_pii_redact" ->
      """WITH raw AS (
        | SELECT doc_id, 'reach user' || doc_id || '@mail.example.com or +1 (555) 01'
        |   || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-4242 via 10.0.'
        |   || (doc_id % 256) || '.7 :: ' || text AS raw
        | FROM documents),
        |r1 AS (SELECT doc_id, raw,
        |  regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM raw),
        |r2 AS (SELECT doc_id, raw, t1,
        |  regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t2 FROM r1)
        |SELECT doc_id,
        | regexp_replace(t2, '\+?[0-9][0-9()\[\] .-]{6,}[0-9]', '<PHONE>', 'g') AS text_redacted,
        | CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        | CAST(len(regexp_extract_all(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
        | CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9()\[\] .-]{6,}[0-9]')) AS BIGINT) AS n_phone
        |FROM r2 ORDER BY doc_id""".stripMargin,

    "q_text_clean" ->
      """WITH raw AS (
        | SELECT doc_id, '===' || chr(9) || source || ' ===' || chr(10) || text
        |   || chr(1) || chr(10) || 'Generated by example corpus v1' AS raw
        | FROM documents),
        |norm AS (
        | SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
        |   replace(replace(replace(raw, chr(13)||chr(10), chr(10)), chr(13), chr(10)), chr(9), ' '),
        |   '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'), ' +', ' ', 'g'), ' *\n *', chr(10), 'g'), ' ') AS t
        | FROM raw),
        |lines AS (
        | SELECT doc_id,
        |  unnest(string_split(t, chr(10))) AS line,
        |  unnest(range(1, len(string_split(t, chr(10)))+1)) AS pos
        | FROM norm),
        |boiler AS (
        | SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1) WHERE df > 20),
        |kept AS (SELECT doc_id, pos, line FROM lines WHERE line NOT IN (SELECT line FROM boiler)),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean, COUNT(*) AS n_kept FROM kept GROUP BY 1)
        |SELECT n.doc_id,
        | CASE WHEN n.t IS NULL THEN NULL ELSE coalesce(a.text_clean, '') END AS text_clean,
        | CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_kept,
        | CAST(CASE WHEN n.t IS NULL THEN 0
        |   ELSE len(string_split(n.t, chr(10))) - coalesce(a.n_kept, 0) END AS BIGINT) AS n_lines_dropped
        |FROM norm n LEFT JOIN agg a ON n.doc_id = a.doc_id
        |ORDER BY n.doc_id""".stripMargin,

    // every fragment below is a verbatim copy of an already-proven oracle
    // (q_doc_stats tokens, q_quality, q_langid, q_repetition, q_dedup_rate
    // digests); the card only adds null-skipping aggregates and mirrored
    // floor divisions on top
    "q_corpus_card" ->
      """WITH g AS (
        | SELECT doc_id, unnest(list_transform(range(1, greatest(len(text)-2, 1)+1),
        |   i -> text[i:i+2])) AS g
        | FROM documents WHERE text IS NOT NULL),
        |gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
        |rep AS (SELECT doc_id,
        |  (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT) AS rep_ppm
        | FROM gc GROUP BY doc_id),
        |t AS (
        | SELECT doc_id, source, text, ' '||text||' ' AS p,
        |  CAST(len(text) AS BIGINT) AS n_chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS BIGINT) AS n_tokens,
        |  md5(text) AS digest,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct
        | FROM documents),
        |s AS (
        | SELECT t.*,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5 + (len(p)-len(replace(p,' of ','')))//4 AS s_en,
        |  (len(p)-len(replace(p,' der ','')))//5 + (len(p)-len(replace(p,' und ','')))//5 + (len(p)-len(replace(p,' die ','')))//5 AS s_de,
        |  (len(p)-len(replace(p,' le ','')))//4 + (len(p)-len(replace(p,' et ','')))//4 + (len(p)-len(replace(p,' la ','')))//4 AS s_fr,
        |  (len(p)-len(replace(p,' el ','')))//4 + (len(p)-len(replace(p,' y ','')))//3 + (len(p)-len(replace(p,' los ','')))//5 AS s_es,
        |  (len(p)-len(replace(p,' the ','')))//5 + (len(p)-len(replace(p,' and ','')))//5
        |    + (len(p)-len(replace(p,' of ','')))//4 + (len(p)-len(replace(p,' a ','')))//3 AS stops
        | FROM t),
        |d AS (
        | SELECT s.source, s.text, s.n_chars, s.n_tokens, s.digest,
        |  CAST(floor((least(1.0, CAST(s.n_chars AS DOUBLE)/500.0)*0.3
        |    + least(1.0, CAST(stops AS DOUBLE)*10.0/CAST(s.n_tokens AS DOUBLE))*0.4
        |    + (1.0 - least(1.0, CAST(s.n_punct AS DOUBLE)/(CAST(s.n_chars AS DOUBLE)*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
        |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
        |       WHEN s_es > 0 THEN 'es'
        |       ELSE 'und' END AS lang_pred,
        |  rep.rep_ppm
        | FROM s LEFT JOIN rep ON s.doc_id = rep.doc_id)
        |SELECT source,
        | CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(COUNT(*) - COUNT(text) AS BIGINT) AS n_null_text,
        | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        | CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        | ((CAST(COUNT(text) AS BIGINT) - CAST(COUNT(DISTINCT digest) AS BIGINT)) * 1000000)
        |   // greatest(CAST(COUNT(text) AS BIGINT), 1) AS dup_ppm,
        | CAST(SUM(quality_ppm) AS BIGINT) // greatest(CAST(COUNT(quality_ppm) AS BIGINT), 1) AS avg_quality_ppm,
        | (CAST(COUNT(CASE WHEN lang_pred = 'en' THEN 1 END) AS BIGINT) * 1000000)
        |   // greatest(CAST(COUNT(quality_ppm) AS BIGINT), 1) AS share_en_ppm,
        | CAST(SUM(rep_ppm) AS BIGINT) // greatest(CAST(COUNT(rep_ppm) AS BIGINT), 1) AS avg_rep_ppm
        |FROM d GROUP BY source ORDER BY source""".stripMargin,

    // md5 the proven primitive; COUNT(DISTINCT) BIGINT both engines;
    // floor division mirrored
    "q_dedup_rate" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        | ((CAST(COUNT(*) AS BIGINT) - CAST(COUNT(DISTINCT md5(text)) AS BIGINT))
        |   * 1000000) // CAST(COUNT(*) AS BIGINT) AS dup_ppm
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin,

    // synthesis mirrored; md5 digests are the proven cross-engine
    // primitive; NULL-digest rows fall through to 'changed' in BOTH
    // engines (CASE equality semantics); presence comes from explicit
    // TRUE markers, not id-nullness, mirroring the operator (a NULL-id
    // row never matches the join and must not read as present/absent by
    // its own null id)
    "q_snapshot_diff" ->
      """WITH o AS (
        | SELECT doc_id, source, md5(text) AS d, TRUE AS p
        | FROM documents WHERE doc_id % 10 <> 9),
        |n AS (
        | SELECT doc_id, source,
        |  md5(CASE WHEN doc_id % 10 = 1 THEN text || ' v2' ELSE text END) AS d,
        |  TRUE AS p
        | FROM documents WHERE doc_id % 10 <> 0),
        |j AS (
        | SELECT coalesce(n.source, o.source) AS source,
        |  CASE WHEN o.p IS NULL THEN 'added'
        |       WHEN n.p IS NULL THEN 'removed'
        |       WHEN o.d = n.d THEN 'unchanged'
        |       ELSE 'changed' END AS status
        | FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // synthesis + regex chain mirrored 1:1; entity replaces in the same
    // order (&amp; last); explicit whitespace class (Java \s and RE2 \s
    // disagree on vertical tab)
    "q_html_extract" ->
      """WITH h AS (
        | SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><style type="text/css">body { margin: 0; }</style>' ||
        |  '<SCRIPT>var n = 1 < 2 && 3 > 2;</SCRIPT></head><body><h1 class="t">Doc ' || doc_id ||
        |  '</h1><p>' || text ||
        |  '</p><p>Tom &amp; Jerry &lt;3 say &quot;hi&quot; &amp;lt; &#39;q&#39;&nbsp;end</p></body></html>' AS h
        | FROM documents WHERE text IS NOT NULL),
        |x AS (
        | SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(regexp_replace(regexp_replace(h,
        |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<[^>]+>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS t,
        |  CAST(len(regexp_extract_all(h, '<[^>]+>')) AS BIGINT) AS n_tags
        | FROM h)
        |SELECT doc_id, trim(regexp_replace(t, '[ \t\r\n]+', ' ', 'g')) AS text_extracted,
        | n_tags
        |FROM x ORDER BY doc_id""".stripMargin,

    // verdict CASE repeats the proven q_quality / q_repetition formulas
    // in CTEs; windowed SUM CAST per the HUGEINT rule
    "q_filter_report" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST((len(' '||text||' ') - len(replace(' '||text||' ', ' the ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' and ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' of ', ''))) // 4
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct
        | FROM documents WHERE text IS NOT NULL),
        |q AS (
        | SELECT doc_id, CAST(floor((least(1.0, chars/500.0)*0.3
        |   + least(1.0, stops*10.0/tokens)*0.4
        |   + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm
        | FROM t),
        |g AS (
        | SELECT doc_id, unnest(list_transform(range(1, greatest(len(text)-2, 1)+1),
        |   i -> text[i:i+2])) AS g
        | FROM documents WHERE text IS NOT NULL),
        |cg AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY 1, 2),
        |r AS (
        | SELECT doc_id, (CAST(MAX(c) AS BIGINT) * 1000000) // CAST(SUM(c) AS BIGINT) AS rep_ppm
        | FROM cg GROUP BY doc_id),
        |v AS (
        | SELECT d.source,
        |  CASE WHEN len(d.text) < 100 THEN 'too_short'
        |       WHEN r.rep_ppm > 35000 THEN 'repetitive'
        |       WHEN q.quality_ppm < 400000 THEN 'low_quality'
        |       ELSE 'pass' END AS verdict
        | FROM documents d JOIN q USING (doc_id) JOIN r USING (doc_id)
        | WHERE d.text IS NOT NULL),
        |c AS (SELECT source, verdict, CAST(COUNT(*) AS BIGINT) AS n_docs
        |      FROM v GROUP BY 1, 2)
        |SELECT source, verdict, n_docs,
        | (n_docs * 1000000) // CAST(SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share_ppm
        |FROM c ORDER BY source, verdict""".stripMargin,

    // synthesis mirrored; first-occurrence keep = MIN(pos) per (doc,
    // line); dropped = per-line multiplicities minus distinct lines.
    // SUM over BIGINT is HUGEINT in DuckDB -> CAST (the hard rule)
    "q_line_dedup" ->
      """WITH raw AS (
        | SELECT doc_id, 'nav: ' || source || chr(10) || text || chr(10)
        |   || 'nav: ' || source || chr(10) || 'cookie notice'
        |   || CASE WHEN doc_id % 2 = 0 THEN chr(10) || text
        |      ELSE chr(10) || 'extra ' || doc_id END
        |   || chr(10) || 'cookie notice' AS raw
        | FROM documents WHERE text IS NOT NULL),
        |lines AS (
        | SELECT doc_id, unnest(string_split(raw, chr(10))) AS line,
        |  unnest(range(1, len(string_split(raw, chr(10)))+1)) AS pos
        | FROM raw),
        |fst AS (
        | SELECT doc_id, line, MIN(pos) AS pos, COUNT(*) AS cnt
        | FROM lines GROUP BY 1, 2)
        |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
        | CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
        | CAST(SUM(cnt) AS BIGINT) - COUNT(*) AS n_lines_dropped
        |FROM fst GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // synthesis mirrored; global keep-first = ROW_NUMBER over the line
    // partition ordered (doc, pos) — the oracle may use the skewed
    // window shape the operator deliberately avoids (exactness, not
    // scale, is its job). SUM-free, but COALESCE + subtraction stay
    // BIGINT by the CAST on the counts.
    "q_corpus_line_dedup" ->
      """WITH raw AS (
        | SELECT doc_id, 'nav: ' || source || chr(10) || text || chr(10)
        |   || 'id: ' || doc_id || chr(10) || 'cookie notice' AS raw
        | FROM documents WHERE text IS NOT NULL),
        |lines AS (
        | SELECT doc_id, unnest(string_split(raw, chr(10))) AS line,
        |  unnest(range(1, len(string_split(raw, chr(10)))+1)) AS pos
        | FROM raw),
        |k AS (
        | SELECT doc_id, line, pos,
        |  ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        | FROM lines),
        |t AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total
        |      FROM lines GROUP BY 1),
        |r AS (
        | SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines_kept
        | FROM k WHERE rn = 1 GROUP BY doc_id)
        |SELECT t.doc_id,
        | COALESCE(r.text_dedup, '') AS text_dedup,
        | COALESCE(r.n_lines_kept, 0) AS n_lines_kept,
        | t.n_total - COALESCE(r.n_lines_kept, 0) AS n_lines_dropped
        |FROM t LEFT JOIN r USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // synthesis mirrored; COUNT/COUNT DISTINCT are BIGINT in DuckDB, and
    // the ppm multiply stays BIGINT — no HUGEINT escape
    "q_boilerplate_report" ->
      """WITH raw AS (
        | SELECT doc_id, 'nav: ' || source || chr(10) || text || chr(10)
        |   || 'id: ' || doc_id || chr(10) || 'cookie notice' AS raw
        | FROM documents WHERE text IS NOT NULL),
        |lines AS (
        | SELECT doc_id, unnest(string_split(raw, chr(10))) AS line FROM raw),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM raw),
        |g AS (
        | SELECT line, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences
        | FROM lines GROUP BY 1)
        |SELECT line, n_docs, n_occurrences,
        | (n_docs * 1000000) // total AS doc_ppm
        |FROM g, n WHERE n_docs >= 20 ORDER BY line""".stripMargin,

    // quality CTE = q_quality's proven oracle; cumsum = ONE global
    // window (the oracle is allowed the single-partition shape the
    // operator decomposes away); windowed SUM over BIGINT -> CAST (the
    // hard rule). Selection rule: first token inside the budget.
    "q_budget_select" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST((len(' '||text||' ') - len(replace(' '||text||' ', ' the ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' and ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' of ', ''))) // 4
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        | FROM documents WHERE text IS NOT NULL),
        |q AS (
        | SELECT doc_id, n_tokens,
        |  CAST(floor((least(1.0, chars/500.0)*0.3
        |    + least(1.0, stops*10.0/tokens)*0.4
        |    + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm
        | FROM t),
        |c AS (
        | SELECT doc_id, quality_ppm, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY quality_ppm DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        | FROM q)
        |SELECT doc_id, quality_ppm, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens - n_tokens < 20000 ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS digest, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // synthesis mirrored; expected canonical derived DIRECTLY per variant
    "q_canonical_url" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 5 AS INT)
        |  WHEN 0 THEN 'https://example.org/p/' || doc_id || '?q=' || doc_id
        |  WHEN 1 THEN 'HTTPS://WWW.EXAMPLE.ORG/p/' || doc_id || '?q=' || doc_id
        |  WHEN 2 THEN 'http://example.org:80/p/' || doc_id || '?utm_source=feed&q=' || doc_id
        |  WHEN 3 THEN 'https://example.org:443/p/' || doc_id || '?q=' || doc_id || '&utm_medium=rss#sec'
        |  ELSE 'https://example.org/p/' || doc_id || '?utm_a=1&gclid=x' END AS url,
        | CASE CAST(doc_id % 5 AS INT)
        |  WHEN 2 THEN 'http://example.org/p/' || doc_id || '?q=' || doc_id
        |  WHEN 4 THEN 'https://example.org/p/' || doc_id
        |  ELSE 'https://example.org/p/' || doc_id || '?q=' || doc_id END AS canonical
        |FROM documents ORDER BY doc_id""".stripMargin,

    // quality CTE = q_quality's proven oracle; canonical derived DIRECTLY
    // from the page id (independent of the canonicalizer chain); rank and
    // count windows share the partition exactly as keepBest does
    "q_url_keep_best" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CAST(len(text) AS DOUBLE) AS chars,
        |  CAST(len(text) - len(translate(text, ' ' || chr(9) || chr(10) || chr(13), '')) + 1 AS DOUBLE) AS tokens,
        |  CAST((len(' '||text||' ') - len(replace(' '||text||' ', ' the ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' and ', ''))) // 5
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' of ', ''))) // 4
        |     + (len(' '||text||' ') - len(replace(' '||text||' ', ' a ', ''))) // 3 AS DOUBLE) AS stops,
        |  CAST(len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct
        | FROM documents),
        |q AS (
        | SELECT doc_id,
        |  CASE WHEN doc_id % 10 <= 1 THEN 'https://example.org/p/' || (doc_id // 10)
        |       ELSE 'https://example.org/u/' || doc_id END AS canonical,
        |  CAST(floor((least(1.0, chars/500.0)*0.3
        |    + least(1.0, stops*10.0/tokens)*0.4
        |    + (1.0 - least(1.0, punct/(chars*0.1+1.0)))*0.3) * 1000000) AS BIGINT) AS quality_ppm
        | FROM t),
        |r AS (
        | SELECT doc_id, canonical, quality_ppm,
        |  ROW_NUMBER() OVER (PARTITION BY canonical ORDER BY quality_ppm DESC, doc_id) AS rnk,
        |  CAST(COUNT(*) OVER (PARTITION BY canonical) AS BIGINT) AS n_crawls
        | FROM q)
        |SELECT doc_id, canonical, quality_ppm, n_crawls
        |FROM r WHERE rnk = 1 ORDER BY doc_id""".stripMargin,

    // oracle derives s_url DIRECTLY from the page id (docs 2k/2k+1 share a
    // canonical URL) — independent of the Spark-side canonicalizer chain
    "q_dedup_cluster" ->
      """WITH RECURSIVE sig AS (
        | SELECT doc_id, md5(text) AS s_text,
        |  list_min(list_transform(range(1, greatest(len(text)-7, 1)+1),
        |    i -> md5(text[i:i+7]))) AS s_shingle,
        |  CASE WHEN doc_id % 10 <= 1 THEN 'https://example.org/p/' || (doc_id // 10)
        |       ELSE 'https://example.org/u/' || doc_id END AS s_url
        | FROM documents),
        |e1 AS (SELECT doc_id AS src, MIN(doc_id) OVER (PARTITION BY s_text) AS dst FROM sig WHERE s_text IS NOT NULL),
        |e2 AS (SELECT doc_id AS src, MIN(doc_id) OVER (PARTITION BY s_shingle) AS dst FROM sig WHERE s_shingle IS NOT NULL),
        |e3 AS (SELECT doc_id AS src, MIN(doc_id) OVER (PARTITION BY s_url) AS dst FROM sig WHERE s_url IS NOT NULL),
        |edges AS (
        | SELECT src, dst FROM e1 WHERE src <> dst
        | UNION
        | SELECT src, dst FROM e2 WHERE src <> dst
        | UNION
        | SELECT src, dst FROM e3 WHERE src <> dst),
        |bi AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
        |reach AS (
        | SELECT src, dst FROM bi
        | UNION
        | SELECT r.src, b.dst FROM reach r JOIN bi b ON r.dst = b.src),
        |comp AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component FROM reach GROUP BY src)
        |SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
        |FROM documents d LEFT JOIN comp c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_ngram" ->
      """WITH s AS (
        | SELECT doc_id, lang, CAST(floor(n_chars/100) AS BIGINT) AS len_band,
        |  list_distinct(list_transform(range(1, greatest(len(text)-2,1)+1),
        |    i -> CAST(ascii(text[i:i]) AS BIGINT)*65536
        |       + CAST(ascii(text[i+1:i+1]) AS BIGINT)*256
        |       + CAST(ascii(text[i+2:i+2]) AS BIGINT))) AS sh
        | FROM documents)
        |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
        | CAST(len(list_intersect(a.sh, b.sh)) * 1000000
        |   // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS BIGINT) AS jacc_ppm
        |FROM s a JOIN s b
        | ON a.lang IS NOT DISTINCT FROM b.lang
        |  AND a.len_band IS NOT DISTINCT FROM b.len_band
        |  AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) * 1000000
        |   // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS BIGINT) >= 800000
        |ORDER BY doc1, doc2""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, md5(text) AS digest,
        | CAST(64 + octet_length(encode(text)) % 960 AS INT) AS width,
        | CAST(64 + (octet_length(encode(text)) * 7919) % 704 AS INT) AS height,
        | CAST(1 + octet_length(encode(text)) // 256 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_image_headers" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |   ELSE 'gif' END AS img_format,
        | CAST(16 + doc_id % 2048 AS INT) AS width,
        | CAST(16 + (doc_id * 31) % 1536 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_audio_headers" ->
      """WITH t AS (
        | SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |    WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(8 * (1 + doc_id % 3) AS INT) AS bits,
        |  (doc_id + 1) * 977 % 100000 AS data_bytes
        | FROM documents)
        |SELECT doc_id, 'pcm' AS codec, channels, sample_rate, bits,
        | CAST(data_bytes * 1000 // (sample_rate * channels * (bits // 8)) AS BIGINT)
        |   AS duration_ms
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_video_headers" ->
      """SELECT doc_id, 'isom' AS brand,
        | CAST(160 + (doc_id * 7) % 1760 AS INT) AS width,
        | CAST(90 + (doc_id * 13) % 990 AS INT) AS height,
        | CAST((doc_id + 1) * 471 % 7200000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    // ok is derived from the truncation rule ALONE (doc_id%5=0 keeps 6
    // bytes -> every media parser rejects; the TXT: tag survives)
    "q_media_quality" ->
      """WITH d AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    WHEN 2 THEN 'video' ELSE 'text' END AS expected_kind,
        |  CASE WHEN doc_id % 4 = 3 OR doc_id % 5 <> 0 THEN 1 ELSE 0 END AS ok
        | FROM documents)
        |SELECT expected_kind, COUNT(*) AS n_docs, CAST(SUM(ok) AS BIGINT) AS n_ok,
        | (COUNT(*) - CAST(SUM(ok) AS BIGINT)) * 1000000 // COUNT(*) AS corrupt_ppm
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_media_route" ->
      """SELECT doc_id,
        | CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |   WHEN 2 THEN 'video' ELSE 'text' END AS media_type,
        | CASE WHEN doc_id % 4 IN (0, 2) THEN CAST(16 + doc_id % 2048 AS INT)
        |   END AS width,
        | CASE WHEN doc_id % 4 IN (0, 2) THEN CAST(16 + (doc_id * 31) % 1536 AS INT)
        |   END AS height,
        | CASE WHEN doc_id % 4 = 1
        |     THEN CAST((doc_id + 1) * 977 % 100000 * 1000 // 8000 AS BIGINT)
        |   WHEN doc_id % 4 = 2 THEN CAST((doc_id + 1) * 471 % 7200000 AS BIGINT)
        |   END AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '[a-z]+') AS toks FROM documents),
        |p AS (
        |  SELECT doc_id, unnest(toks) AS w,
        |    generate_subscripts(toks, 1) AS pos FROM t),
        |q AS (
        |  SELECT doc_id, pos, w,
        |    LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM p)
        |SELECT doc_id, COUNT(*) AS n_hits, CAST(MIN(pos) AS BIGINT) AS first_pos
        |FROM q WHERE w = 'hash' AND nxt = 'join'
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
