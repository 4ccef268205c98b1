package graft.operators

import graft.functions.InterleaveBits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data layout for scan locality — the write-side half of the
  * Z-order story ([[graft.functions.InterleaveBits]] is the key;
  * this is the writer that turns it into files).
  *
  * `zorderWrite` range-partitions on the Morton key and sorts within
  * partitions, so every produced parquet file covers a bounded box in
  * BOTH dimensions: its row-group/file min-max stats stay tight for
  * either column, and a selective predicate on either dimension prunes
  * most files (LayoutSpec proves this file-for-file against a linear
  * sort, which keeps one dimension tight and the other full-span in
  * every file). At 100 TB this is the difference between a point query
  * scanning one file and scanning the whole table on the non-sort
  * column.
  */
object Layout {

  /** Write `df` z-ordered on (c1, c2) into `numFiles` range partitions.
    *
    * Both columns are first normalized to a common 16-bit range from
    * their observed min/max — REQUIRED for interleaving to balance the
    * dimensions: raw ids of different magnitudes put the wide column in
    * all the high bits and the narrow one contributes nothing to the
    * file split (the same reason Z-ordering table formats interleave
    * per-column range ids, not raw values). The min/max pass is one
    * cheap slim aggregate over the write input. */
  def zorderWrite(df: DataFrame, c1: String, c2: String,
                  path: String, numFiles: Int): Unit = {
    val r = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    def norm(c: String, lo: Double, hi: Double) =
      if (hi > lo) ((col(c).cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long")
      else lit(0L)
    val keyed = df.withColumn("__z", InterleaveBits(
      norm(c1, r.getDouble(0), r.getDouble(1)),
      norm(c2, r.getDouble(2), r.getDouble(3))))
    write(keyed, path, numFiles)
  }

  /** N-column z-order (2-4 dims): each column normalizes to a common
    * 16-bit range, then the variadic [[graft.functions.ZOrderKey]]
    * interleaves them round-robin so every dimension shares the high
    * bits of the file split evenly. */
  def zorderWriteN(df: DataFrame, cols: Seq[String],
                   path: String, numFiles: Int): Unit = {
    require(cols.size >= 2 && cols.size <= 4, "zorderWriteN takes 2-4 columns")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val normed = cols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (r.getDouble(2 * i), r.getDouble(2 * i + 1))
      if (hi > lo) ((col(c).cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long")
      else lit(0L)
    }
    write(df.withColumn("__z", graft.functions.ZOrderKey(normed)), path, numFiles)
  }

  /** Write `df` Hilbert-ordered on (c1, c2): same 16-bit range
    * normalization as [[zorderWrite]], but the key walks the Hilbert
    * curve — consecutive key ranges have no quadrant-boundary jumps, so
    * per-file bounding boxes come out tighter than Morton's for the same
    * file count (HilbertKeySpec quantifies chunk for chunk). */
  def hilbertWrite(df: DataFrame, c1: String, c2: String,
                   path: String, numFiles: Int): Unit = {
    val r = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    def norm(c: String, lo: Double, hi: Double) =
      if (hi > lo) ((col(c).cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long")
      else lit(0L)
    val keyed = df.withColumn("__z", graft.functions.HilbertKey(
      norm(c1, r.getDouble(0), r.getDouble(1)),
      norm(c2, r.getDouble(2), r.getDouble(3)), 16))
    write(keyed, path, numFiles)
  }

  /** Baseline: linear sort layout on a single column. */
  def linearWrite(df: DataFrame, c: String, path: String, numFiles: Int): Unit =
    write(df.withColumn("__z", col(c)), path, numFiles)

  private def write(keyed: DataFrame, path: String, numFiles: Int): Unit =
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
