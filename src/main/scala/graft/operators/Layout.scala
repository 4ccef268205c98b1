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
    val Seq(n1, n2) = norm16(df, Seq(c1, c2))
    write(df.withColumn("__z", InterleaveBits(n1, n2)), path, numFiles)
  }

  /** N-column z-order (2-4 dims): each column normalizes to a common
    * 16-bit range, then the variadic [[graft.functions.ZOrderKey]]
    * interleaves them round-robin so every dimension shares the high
    * bits of the file split evenly. */
  def zorderWriteN(df: DataFrame, cols: Seq[String],
                   path: String, numFiles: Int): Unit = {
    require(cols.size >= 2 && cols.size <= 4, "zorderWriteN takes 2-4 columns")
    write(df.withColumn("__z", graft.functions.ZOrderKey(norm16(df, cols))),
      path, numFiles)
  }

  /** Write `df` Hilbert-ordered on (c1, c2): same 16-bit range
    * normalization as [[zorderWrite]], but the key walks the Hilbert
    * curve — consecutive key ranges have no quadrant-boundary jumps, so
    * per-file bounding boxes come out tighter than Morton's for the same
    * file count (HilbertKeySpec quantifies chunk for chunk). */
  def hilbertWrite(df: DataFrame, c1: String, c2: String,
                   path: String, numFiles: Int): Unit = {
    val Seq(n1, n2) = norm16(df, Seq(c1, c2))
    write(df.withColumn("__z", graft.functions.HilbertKey(n1, n2, 16)),
      path, numFiles)
  }

  /** Shared 16-bit range normalization for the curve writers: each column
    * maps to [0, 65535] from its observed min/max (one slim aggregate).
    * NULL stats — an EMPTY input (routine for an incremental re-layout
    * partition) or an all-NULL column — normalize to the constant 0 key
    * instead of NPE-ing on r.getDouble: the writer then emits an empty
    * (or single-box) dataset and the pipeline proceeds. A constant column
    * (hi == lo) is likewise 0 — it carries no split signal. */
  private def norm16(df: DataFrame, cols: Seq[String]): Seq[org.apache.spark.sql.Column] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      if (r.isNullAt(2 * i) || r.isNullAt(2 * i + 1)) lit(0L)
      else {
        val (lo, hi) = (r.getDouble(2 * i), r.getDouble(2 * i + 1))
        if (hi > lo) ((col(c).cast("double") - lit(lo)) * 65535.0 / (hi - lo)).cast("long")
        else lit(0L)
      }
    }
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
    * the packing is the proven cumulative-quota shape (q_pack_sequences),
    * computed as a plain driver-side scan over the listed index — the
    * index is already a driver array, so no Spark job (and no global
    * window) exists at all. Groups then compact independently —
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
    // quota grouping: group = which targetBytes-window the file's
    // cumulative total ENDS in — the q_pack_sequences shape (a strict
    // greedy close-on-overflow is inherently sequential and buys nothing
    // here: the bound above is what compaction needs). The file index is
    // ALREADY a driver array (one FS listing), so the cumsum is a plain
    // scan — no Spark job, and no Window.orderBy-without-partitionBy (the
    // CLAUDE.md hard rule admits no "it's only metadata" exception).
    var cum = 0L
    val planned = files.map { case (f, b) =>
      cum += b
      (math.max(cum - 1, 0L) / targetBytes, f, b)
    }
    val byGroup = planned.groupBy(_._1)
      .map { case (g, rows) => g -> ((rows.length.toLong, rows.map(_._3).sum)) }
    planned.toSeq
      .map { case (g, f, b) =>
        val (nf, gb) = byGroup(g)
        (g, f, b, nf, gb)
      }
      .toDF("group_id", "file", "bytes", "group_files", "group_bytes")
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
