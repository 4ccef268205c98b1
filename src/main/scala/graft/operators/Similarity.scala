package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - `bruteForceTopK`: exact cosine top-k. The query set is broadcast, so
  *    the scan is map-side (no shuffle of the corpus); per-query top-k via
  *    a bounded window. The right baseline, and the right plan when the
  *    query set is small.
  *  - `lshTopK`: random-hyperplane LSH — sign-bit signatures from
  *    deterministic pseudo-random planes (seeded xxhash64, so executors
  *    need no shared RNG state), candidates from Hamming-banded buckets,
  *    exact cosine re-rank inside buckets. The 100 TB path: touches only
  *    bucket collisions instead of the full corpus per query.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * (sequential left-to-right accumulation — deterministic; see
    * [[graft.functions.FloatDotProduct]]). A zero vector scores 0
    * against everything — without the guard 0/0 = NaN, and NaN sorts
    * FIRST under `desc("sim")`, so one all-zero embedding (an empty doc)
    * would crowd the head of every top-k it collides into. */
  def cosine(a: Column, b: Column): Column = {
    val dot = graft.functions.FloatDotProduct
    safeSim(dot(a, b), sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** `dot / normProd` with the zero-vector case pinned to 0.0 — shared by
    * every similarity scorer here (see [[cosine]]'s NaN note). */
  private def safeSim(dot: Column, normProd: Column): Column =
    when(normProd === lit(0.0), lit(0.0)).otherwise(dot / normProd)

  /** Exact top-k neighbors for each row of `queries` within `corpus`
    * (self-matches excluded by id). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")))
    val scored = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
      .join(q, col("cand_id") =!= col("qid"))
      .select(col("qid"), col("cand_id"), cosine(col("qvec"), col("cvec")).as("sim"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cand_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Per-vector symmetric int8 quantization
    * ([[graft.functions.QuantKernels]]): the slim (id, qvec, qnorm)
    * projection an ANN index stores — 1/4 the bytes of float32, and the
    * self-norm is precomputed so pair scoring never re-walks a vector
    * for its own magnitude. Pure map-side projection, no shuffle. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val qv = graft.functions.QuantizeInt8(col(vecCol))
    df.select(col(idCol), qv.as("qvec"),
      graft.functions.IntDotProduct(qv, qv).as("qnorm"))
  }

  /** Exact top-k over int8-QUANTIZED vectors (self-matches excluded by
    * id). The scales cancel in cosine, so the score is an INTEGER dot
    * product (engine-exact, oracle-checkable — unlike float cosine)
    * divided by the precomputed integer self-norms; only the final two
    * sqrt/divides touch floating point. Same broadcast shape as
    * [[bruteForceTopK]], but each pair walks 64 ints instead of 64
    * floats and the candidate side ships 1/4 the vector bytes. */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(quantize(queries, idCol, vecCol)
      .select(col(idCol).as("qid"), col("qvec").as("q_qvec"), col("qnorm").as("q_qnorm")))
    val scored = quantize(corpus, idCol, vecCol)
      .select(col(idCol).as("cand_id"), col("qvec").as("c_qvec"), col("qnorm").as("c_qnorm"))
      .join(q, col("cand_id") =!= col("qid"))
      .select(col("qid"), col("cand_id"),
        graft.functions.IntDotProduct(col("q_qvec"), col("c_qvec")).as("dot"),
        col("q_qnorm"), col("c_qnorm"))
      .withColumn("sim", safeSim(col("dot").cast("double"),
        sqrt(col("q_qnorm").cast("double")) * sqrt(col("c_qnorm").cast("double"))))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cand_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid"), col("cand_id"), col("rnk"), col("dot"), col("sim"))
  }

  /** `planes`-bit random-hyperplane signature. Plane p's component for
    * dimension d is ±1 by the parity of xxhash64(p, d) — deterministic
    * across executors with no materialized plane matrix. Native one-pass
    * kernel ([[graft.functions.RhpSignature64]]) — the former
    * `zip_with`+`aggregate` formulation ran interpreted and traversed the
    * vector `planes` times per row (bit-identical replacement,
    * SignatureKernelsSpec). */
  def rhpSignature(vecCol: Column, planes: Int): Column =
    graft.functions.RhpSignature64(vecCol, planes)

  /** The chunk-LSH paths split the signature into 4 equal chunks:
    * planes < 4 gives 0-bit chunks — EVERY row in one bucket, a full
    * quadratic self-join; planes not divisible by 4 silently discards
    * the top signature bits. Both are tuning mistakes the docstring
    * invites, so they fail at the call. */
  private def requirePlanes(planes: Int): Unit =
    require(planes >= 4 && planes <= 64 && planes % 4 == 0,
      s"planes must be a multiple of 4 in [4, 64], got $planes (the " +
        "signature splits into 4 equal bucket chunks)")

  /** IVF (inverted-file) approximate top-k: KMeans centroids partition the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * cells and re-ranks exactly inside them.
    *
    * Split into build/search: [[IvfIndex.build]] fits centroids ONCE on a
    * bounded sample (an index-build step, cached per `cacheKey`);
    * [[ivfSearch]] then runs with zero ML stages. Round 1 refit KMeans on
    * the full corpus inside every invocation — at 100 TB the fit dominates
    * and reruns per call.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
      cacheKey: Option[String] = None): DataFrame = {
    val index = cacheKey match {
      case Some(key) => IvfIndex.getOrBuild(key, corpus, vecCol, nlist, seed)
      case None      => IvfIndex.build(corpus, vecCol, nlist, seed)
    }
    ivfSearch(corpus, queries, idCol, vecCol, k, index, nprobe)
  }

  /** IVF search against a prebuilt [[IvfIndex]]. Centroids are embedded as
    * plan LITERALS (nlist × dim floats — tiny), so cell assignment and
    * probe selection are map-side codegen'd expressions: no ML stage, no
    * per-row UDF, no assignment shuffle. The only shuffles left are the
    * candidate equi-join on `cell` and the final per-query top-k window.
    *
    * Squared L2 to centroid c is |v|² − 2·v·c + |c|²; |v|² is constant per
    * row, so the argmin/ranking uses only (−2·v·c + |c|²). */
  def ivfSearch(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, index: IvfIndex, nprobe: Int): DataFrame = {
    val dot = graft.functions.FloatDotProduct
    def cellStructs(vec: Column) = index.centroids.zipWithIndex.map { case (c, i) =>
      val cNormSq = c.map(x => x.toDouble * x.toDouble).sum
      struct((lit(-2.0) * dot(vec, typedlit(c)) + lit(cNormSq)).as("d"),
        lit(i).as("cell"))
    }
    // nearest cell = least struct (d, cell) — deterministic tie-break
    val assigned = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"),
      sqrt(dot(col(vecCol), col(vecCol))).as("cn"),
      least(cellStructs(col(vecCol)): _*).getField("cell").as("cell"))
    // nprobe nearest cells per query: sort the static struct array, slice —
    // map-side, no ranking window
    val probed = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        sqrt(dot(col(vecCol), col(vecCol))).as("qn"),
        explode(slice(array_sort(array(cellStructs(col(vecCol)): _*)), 1, nprobe)).as("p"))
      .select(col("qid"), col("qvec"), col("qn"), col("p.cell").as("cell"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cand_id"))
    probed.join(assigned, Seq("cell"))
      .filter(col("cand_id") =!= col("qid"))
      .select(col("qid"), col("cand_id"),
        safeSim(dot(col("qvec"), col("cvec")), col("qn") * col("cn")).as("sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Near-duplicate PAIRS above a cosine threshold via the same chunk-LSH
    * buckets — for self-dedup: ordered pairs (id1 < id2) so the symmetric
    * candidate space is halved, and no per-query ranking window.
    *
    * Caller contract: `idCol` must be unique per row (it is the join key
    * for the post-dedup vector re-attach; duplicate ids would re-multiply
    * pairs). Same precondition as every dedup operator here.
    *
    * Shuffle discipline (same as MinHash's slim-pair pattern): the bucket
    * self-join and the pair dedup carry ONLY (id, chunk, cv) — never the
    * embeddings — so the candidate stage shuffles ~20 bytes/row instead of
    * two float vectors per pair; the vectors are re-attached afterwards by
    * two equi-joins against the slim base projection (broadcast-able
    * candidate side at scale, map-side corpus scan). */
  def lshNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, planes: Int = 16,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    requirePlanes(planes)
    val chunkBits = planes / 4
    val chunkMask = (1L << chunkBits) - 1
    val dot = graft.functions.FloatDotProduct
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sqrt(dot(col(vecCol), col(vecCol))).as("n"))
    val chunked = Dedup.dropHotBuckets(corpus
      .select(col(idCol).as("id"), rhpSignature(col(vecCol), planes).as("sig"))
      .select(col("id"), explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * chunkBits).bitwiseAND(lit(chunkMask)).as("cv"))
      }: _*)).as("cc"))
      .select(col("id"), col("cc.chunk"), col("cc.cv")),
      Seq("chunk", "cv"), maxBucket)
      // one PINNED exchange for both sides of the bucket self-join (sig
      // once; explicit width so AQE cannot coalesce the bytes-tiny bucket
      // table to one partition under the pair emission — Dedup.pinWidth)
      .transform(Dedup.pinWidth(_, col("chunk"), col("cv")))
    val l = chunked.select(col("id").as("qid"), col("chunk"), col("cv"))
    val r = chunked.select(col("id").as("cand_id"), col("chunk").as("chunk_r"),
      col("cv").as("cv_r"))
    val cand = l.join(r, col("chunk") === col("chunk_r") &&
        col("cv") === col("cv_r") && col("qid") < col("cand_id"))
      .select(col("qid"), col("cand_id"))
      .dropDuplicates("qid", "cand_id")
    // shuffle-HASH builds on the vector side (the exactVerifyPairs
    // rationale): SMJ would sort the candidate stream with an attached
    // float vector per row; a hash build holds one PARTITION of the slim
    // doc-sized vector table and never sorts candidates. pinWidth before
    // each re-attach join: the id-pair exchanges are bytes-tiny, so AQE
    // coalesces them to one partition and the per-pair dot-product kernel
    // in the join stages runs single-threaded (Dedup.pinWidth rationale).
    Dedup.pinWidth(cand, col("qid"))
      .join(base.select(col("id").as("qid"), col("vec").as("qvec"), col("n").as("qn"))
        .hint("shuffle_hash"), Seq("qid"))
      .transform(Dedup.pinWidth(_, col("cand_id")))
      .join(base.select(col("id").as("cand_id"), col("vec").as("cvec"), col("n").as("cn"))
        .hint("shuffle_hash"), Seq("cand_id"))
      .select(col("qid"), col("cand_id"),
        safeSim(dot(col("qvec"), col("cvec")), col("qn") * col("cn")).as("sim"))
      .filter(graft.functions.PushdownBarrier.double(col("sim")) >= minCosine)
  }

  /** Approximate top-k: candidates share at least one of four signature
    * chunks (planes/4 bits each — tune to the corpus's similarity scale:
    * fewer bits = coarser buckets = higher recall, more candidates),
    * re-ranked by exact cosine within buckets. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, planes: Int = 16,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    requirePlanes(planes)
    val chunkBits = planes / 4
    val chunkMask = (1L << chunkBits) - 1
    // Same slim-shuffle discipline as lshNearDupPairs: the bucket join and
    // the pair dedup carry ids only; vectors and precomputed norms are
    // re-attached afterwards (cosine per pair = one codegen'd dot product).
    def chunkedIds(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), rhpSignature(col(vecCol), planes).as("sig"))
        .select(col(id), explode(array((0 until 4).map { c =>
          struct(lit(c).as("chunk"),
            shiftright(col("sig"), c * chunkBits).bitwiseAND(lit(chunkMask)).as("cv"))
        }: _*)).as("cc"))
        .select(col(id), col("cc.chunk"), col("cc.cv"))
    def slim(df: DataFrame, id: String, vec: String, n: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        sqrt(graft.functions.FloatDotProduct(col(vecCol), col(vecCol))).as(n))
    val dot = graft.functions.FloatDotProduct
    val cq = chunkedIds(queries, "qid")
    // hot-bucket cap on the CORPUS side, exactly like lshNearDupPairs: a
    // heavy cluster of near-identical vectors in one (chunk, cv) bucket
    // otherwise makes the bucket join emit q*m candidate rows unbounded
    val cc = Dedup.dropHotBuckets(
      chunkedIds(corpus, "cand_id"), Seq("chunk", "cv"), maxBucket)
    val cands = cq.join(cc,
        cq("chunk") === cc("chunk") && cq("cv") === cc("cv") &&
          col("cand_id") =!= col("qid"))
      .select(col("qid"), col("cand_id"))
      .dropDuplicates("qid", "cand_id")
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cand_id"))
    cands
      // queries side: SMALL by contract (a query set, not the corpus) —
      // the optimizer's broadcast is the right plan, no hint
      .join(slim(queries, "qid", "qvec", "qn"), Seq("qid"))
      // corpus side: doc-sized — shuffle-hash build, never sort the
      // candidate stream with attached vectors (exactVerifyPairs
      // rationale); pinWidth so the bytes-tiny candidate exchange is not
      // AQE-coalesced under the per-pair cosine kernel (Dedup.pinWidth)
      .transform(Dedup.pinWidth(_, col("cand_id")))
      .join(slim(corpus, "cand_id", "cvec", "cn").hint("shuffle_hash"), Seq("cand_id"))
      .select(col("qid"), col("cand_id"),
        safeSim(dot(col("qvec"), col("cvec")), col("qn") * col("cn")).as("sim"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    * cluster the embedding space by near-duplicate cosine (LSH candidate
    * pairs → connected components, the [[lshNearDupPairs]] +
    * `Dedup.connectedComponents` machinery), then within each cluster keep
    * ONE representative — the highest `scoreCol` (ties to the smallest
    * id), so the dedup pass retains the best-quality copy rather than an
    * arbitrary one (the keep-best twin of exact dedup's keep-min, applied
    * to SEMANTIC duplicates that share no bytes).
    *
    * `scores` carries (idCol, scoreCol) for every embedding row — e.g.
    * the documents table's quality score through the 1:1 doc/vec id map.
    * Rows with no cluster edge are singletons: their own component, kept.
    *
    * Scale shape: everything up to the component table is the proven
    * near-dup pipeline (slim bucketed pair joins, hot-bucket cap, CC
    * shuffle-bounded by |E|); the flagging pass is ONE window shuffle on
    * the component key (rank + cluster-size share the partition — the
    * keepBest pattern), and the score attach is an id equi-join of two
    * slim projections.
    *
    * Returns (idCol, component, n_cluster, scoreCol, kept). */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      scores: DataFrame, scoreCol: String,
      minCosine: Double, planes: Int = 16,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(emb.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"semanticDedup needs a NUMERIC $idCol: connectedComponents casts " +
        s"ids to long, and a string id (got ${emb.schema(idCol).dataType}) " +
        "would fail the ANSI cast deep inside the CC loop")
    val pairs = lshNearDupPairs(emb, idCol, vecCol, minCosine, planes, maxBucket)
      .select(col("qid").as("src"), col("cand_id").as("dst"))
    val comp = Dedup.connectedComponents(pairs, "src", "dst")
    // corpus-sized checkpointed label table: hash-build, never broadcast
    // (the q_lm_score hazard class — PlanAudit checkpoint-broadcast sweep)
    val labeled = emb.select(col(idCol))
      .join(comp.withColumnRenamed("node", idCol).hint("shuffle_hash"),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("component"))
      .join(scores.select(col(idCol), col(scoreCol)), Seq(idCol), "left")
    val part = Window.partitionBy("component")
    labeled
      .withColumn("n_cluster", count(lit(1)).over(part))
      .withColumn("kept", row_number().over(
        part.orderBy(col(scoreCol).desc, col(idCol).asc)) === 1)
      .select(col(idCol), col("component"), col("n_cluster"),
        col(scoreCol), col("kept"))
  }
}
