package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE merge LEARNING (Sennrich, Haddow, Birch 2016) — the
  * training-side twin of `functions.BpeTokenCount`'s merge-applying
  * counter: learn the merge table itself from the corpus.
  *
  * Shape at 100 TB — the part that matters: the corpus is scanned ONCE,
  * into the word-frequency table (pretokenized by the same public regex
  * the counting kernels use; classic BPE trains on word types weighted by
  * frequency, not on the raw token stream). Every subsequent merge round
  * iterates on that vocabulary table only — pair counting is an explode +
  * map-side-combined sum over `vocab` rows (millions, not billions), the
  * argmax is a 1-row bounded top-k collect (the iterate-until-fixpoint
  * driver shape `connectedComponents` established), and the merge rewrite
  * is a pure codegen'd kernel projection (`functions.MergePair` — greedy
  * left-to-right, boundary-correct on symbol ARRAYS; a join-string
  * replace cannot respect symbol boundaries). Each round rebases lineage
  * with an eager localCheckpoint (the CC discipline; swap for
  * `checkpoint()` on a cluster).
  *
  * Determinism: pair counts are integers; ties break on the pair string
  * ascending — bit-stable across runs and engines. Symbols never contain
  * the `\u0001` pair separator: multi-char words come from `[a-z]+|[0-9]+`
  * and other characters tokenize as single-symbol words (no pairs).
  *
  * Returns (rank, left, right, merged, pair_count): `numMerges` rows (or
  * fewer if the vocabulary runs out of adjacent pairs). */
object BpeTrainer {

  val Sep = "\u0001"

  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    var vocab = docs
      .select(explode(regexp_extract_all(col(textCol),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(split(col("w"), "").as("sym"), col("n"))
      .localCheckpoint(true) // the ONLY corpus-sized step
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
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result().map(Row.fromTuple), 1), schema)
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
