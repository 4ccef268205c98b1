package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`). The brute-force query has a DuckDB
  * oracle (double-precision cosine, floor-scaled); the LSH variant is
  * rows-only (xxhash64 planes are not reproducible in SQL) and is checked
  * against brute-force truth in SimilaritySpec.
  */
object VectorQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact top-5 cosine neighbors for the first 10 vectors (broadcast
    // queries → map-side scan; no corpus shuffle).
    "q_knn_brute" -> { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
        .select(col("qid"), col("cand_id"), col("rnk"),
          floor(col("sim") * 1000000).cast("long").as("sim_ppm"))
        .orderBy("qid", "rnk")
    },

    // Approximate neighbors via random-hyperplane LSH, re-ranked exactly
    // within buckets (rows-only; recall checked in SimilaritySpec).
    "q_ann_lsh" -> { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 5)
        .select(col("qid"), col("cand_id"), col("rnk"),
          floor(col("sim") * 1000000).cast("long").as("sim_ppm"))
        .orderBy("qid", "rnk")
    },

    // IVF (KMeans cells + probe-and-rerank) approximate neighbors
    // (rows-only; recall vs brute force checked in PipelineOpsSpec). The
    // index is built once per corpus dir and reused — the search plan
    // itself has no ML stage (asserted in PipelineOpsSpec).
    "q_ann_ivf" -> { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 4, cacheKey = Some(dir))
        .select(col("qid"), col("cand_id"), col("rnk"),
          floor(col("sim") * 1000000).cast("long").as("sim_ppm"))
        .orderBy("qid", "rnk")
    },

    // Embedding near-duplicate pairs above a cosine threshold via LSH
    // buckets (rows-only; threshold set to this corpus's similarity scale).
    "q_embedding_dedup" -> { (s, dir) =>
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding", minCosine = 0.3)
        .select(col("qid"), col("cand_id"),
          floor(col("sim") * 1000000).cast("long").as("sim_ppm"))
        .orderBy("qid", "cand_id")
    },
  )

  val oracles: Map[String, String] = Map(
    "q_knn_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        | SELECT qid, vec_id AS cand_id,
        |  list_sum(list_transform(list_zip(qvec, embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))
        |   / sqrt(list_sum(list_transform(list_zip(qvec, qvec), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE))))
        |   / sqrt(list_sum(list_transform(list_zip(embedding, embedding), p -> CAST(p[1] AS DOUBLE)*CAST(p[2] AS DOUBLE)))) AS sim
        | FROM q, embeddings WHERE vec_id <> qid),
        |ranked AS (
        | SELECT qid, cand_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cand_id) AS rnk, sim
        | FROM pairs)
        |SELECT qid, cand_id, rnk, CAST(floor(sim*1000000) AS BIGINT) AS sim_ppm
        |FROM ranked WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
  )
}
