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

  /** Plan small-file compaction for a parquet directory: list the file
    * index, then quota-group files (in name order — stable across runs)
    * by cumulative byte boundaries of targetBytes. Every group's byte sum
    * is < targetBytes + max(file size) — the same guarantee parquet
    * row-group targeting gives — and a file larger than the target lands
    * in a group of its own unless followers share its quota window.
    * Returns one row per file: (group_id, file, bytes, group_files,
    * group_bytes).
    *
    * The listing is metadata-scale (one FS listing, not a data scan) and
    * the packing is the proven cumulative-quota shape (q_pack_sequences):
    * at a million files this runs as a DataFrame window over the file
    * index, never touching row data. Groups then compact independently —
    * each is a separate read-coalesce-write job ([[compact]]), so a
    * 100 TB re-layout parallelizes per group and restarts cheaply. */
  def compactionPlan(spark: org.apache.spark.sql.SparkSession,
                     path: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy(_._1)
    import spark.implicits._
    val idx = files.toSeq.toDF("file", "bytes")
    // quota grouping: group = which targetBytes-window the file's
    // cumulative total ENDS in — one running-total window pass over the
    // file index, the q_pack_sequences shape (a strict greedy close-on-
    // overflow is inherently sequential and buys nothing here: the bound
    // above is what compaction needs).
    val w = org.apache.spark.sql.expressions.Window.orderBy("file")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // cumulative greedy grouping is inherently sequential; on the
    // metadata-sized index a single-partition window is the right tool
    // (files count ~1e6 rows max — trivially window-able)
    val planned = idx
      .withColumn("cum", sum("bytes").over(w))
      .withColumn("grp", expr(s"CAST((cum - 1) div $targetBytes AS BIGINT)"))
    planned
      .withColumn("group_files", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("grp")))
      .withColumn("group_bytes", sum("bytes")
        .over(org.apache.spark.sql.expressions.Window.partitionBy("grp")))
      .select(col("grp").as("group_id"), col("file"), col("bytes"),
        col("group_files"), col("group_bytes"))
  }

  /** Execute a [[compactionPlan]]: rewrite each group as ONE parquet file
    * under outPath. Groups are independent jobs (restart-safe; on a
    * cluster submit them concurrently). */
  def compact(spark: org.apache.spark.sql.SparkSession,
              plan: DataFrame, outPath: String): Unit = {
    val groups = plan.select("group_id", "file").collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
    groups.foreach { case (gid, rows) =>
      val files = rows.map(_.getString(1))
      spark.read.parquet(files: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$outPath/group=$gid")
    }
  }

  private def write(keyed: DataFrame, path: String, numFiles: Int): Unit =
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
