package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval (range) join — an operator Spark's built-in
  * join strategies handle badly: a raw `p BETWEEN lo AND hi` predicate
  * with no equality conjunct plans as BroadcastNestedLoopJoin (all-pairs
  * per partition), which dies at scale when neither side is small.
  *
  * The re-expression: quantize the range dimension into fixed-width
  * buckets. Each interval explodes into one row per covered bucket
  * (`O(len/bucketWidth)` rows); each point maps to exactly one bucket.
  * The join is then a plain hash equi-join on (equiCols..., bucket) with
  * the exact `lo <= p <= hi` test as a post-condition — shuffle keys stay
  * small, both sides scale out, and Catalyst plans a SortMergeJoin or
  * broadcast as sizes dictate. A (point, interval) pair can meet in at
  * most one bucket (the point's), so no dedup pass is needed — overlapping
  * intervals correctly yield one row each.
  *
  * Pick `bucketWidth` near the median interval length: too small explodes
  * interval rows, too large turns buckets into mini cross joins. Both
  * failure modes degrade gracefully (correctness never depends on width) —
  * up to a hard cap: an interval spanning more than `maxBucketsPerInterval`
  * buckets fails FAST with a named error instead of silently exploding
  * `(hi-lo)/bucketWidth` rows (or hitting Spark's opaque
  * sequence-length limit mid-job at `hi-lo > bucketWidth * 2^31`). Raise
  * the cap deliberately if intervals really are that long relative to
  * `bucketWidth` — but the right fix is almost always a wider bucket.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * `[loCol, hiCol]` (inclusive) contains `pointCol`, matching on
    * `equiCols` (column names present on BOTH sides). All range columns
    * must be numeric (convert timestamps with `ts div 1000000` first).
    * Output: all point columns, then interval columns minus `equiCols`.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      equiCols: Seq[String] = Nil,
      bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val p = points
      .withColumn("__pb", floor(col(pointCol) / lit(bucketWidth)).cast("long"))
      .alias("p")
    val loB = floor(col(loCol) / lit(bucketWidth)).cast("long")
    val hiB = floor(col(hiCol) / lit(bucketWidth)).cast("long")
    // fail fast on pathological intervals: a row-level guard (the span is
    // data, not plan metadata), raised BEFORE the explode can materialize
    val guardedHiB = when(
      hiB - loB >= lit(maxBucketsPerInterval.toLong),
      raise_error(concat(
        lit(s"graft.RangeJoin: interval [${loCol}, ${hiCol}]=["), col(loCol),
        lit(", "), col(hiCol),
        lit(s"] spans more than maxBucketsPerInterval=$maxBucketsPerInterval buckets " +
          s"at bucketWidth=$bucketWidth; widen bucketWidth or raise the cap"))
      ).cast("long")
    ).otherwise(hiB)
    val i = intervals
      .withColumn("__ib", explode(sequence(loB, guardedHiB)))
      .alias("i")
    val cond = equiCols.map(c => col(s"p.$c") === col(s"i.$c"))
      .foldLeft(
        col("p.__pb") === col("i.__ib") &&
          col(s"p.$pointCol") >= col(s"i.$loCol") &&
          col(s"p.$pointCol") <= col(s"i.$hiCol"))(_ && _)
    val outCols =
      points.columns.map(c => col(s"p.$c")) ++
        intervals.columns.filterNot(equiCols.contains).map(c => col(s"i.$c"))
    p.join(i, cond).select(outCols.toSeq: _*)
  }
}
