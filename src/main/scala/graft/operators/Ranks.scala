package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import graft.operators.Lineage.LineageOps

/** Distributed global order statistics — row_number / running sum / NTILE
  * over a TOTAL order — with NO single-partition stage anywhere.
  *
  * The classic 100 TB trap: `Window.orderBy(...)` with no partition spec
  * plans a `WindowExec` that moves the whole input into ONE task ("No
  * Partition Defined" warning). The fix is the two-level range-bucket
  * prefix decomposition (the [[Corpus.selectByBudget]] shape, hoisted here
  * so every global-rank query shares one audited implementation):
  *
  *  1. `repartitionByRange` on the order columns — sampled boundaries, so
  *     skewed keys still land in balanced buckets, and every bucket owns a
  *     contiguous slice of the total order;
  *  2. per-bucket row counts / value sums (≤ `buckets` rows — a BOUNDED
  *     driver gather, the IvfIndex-centroid pattern) become exclusive
  *     prefix offsets in a DRIVER-BUILT broadcast table joined back on the
  *     bucket id — a hashed O(1) probe per row (a literal-map
  *     `element_at` would LINEAR-SCAN the map per row: tolerable at 64
  *     entries, wrong at the grouped variant's scale), and no tiny
  *     single-partition prefix window (which, although bounded, still
  *     tripped the WindowExec warning in rounds ≤ 8);
  *  3. a within-bucket window (hash-partitioned on the bucket id — each
  *     bucket sorts independently) plus the bucket's prefix is the exact
  *     global statistic.
  *
  * The decomposition is invariant to WHERE the sampled range boundaries
  * fall (associativity of + over a fixed total order), so results are
  * bit-identical to the naive global window — RanksSpec property-tests
  * that against Spark's own `row_number`/`sum`/`ntile`, and the DuckDB
  * oracles of the q_* callers pin it end to end.
  *
  * The input is eagerly `localCheckpoint`ed once: the prefix gather and
  * every downstream job must see the SAME materialized bucketing
  * (`spark_partition_id` is only meaningful within one materialization;
  * range-boundary sampling is not stable across separate executions).
  * The checkpoint holds the REDUCED grain a rank query windows over
  * (per-user / per-key aggregates), never the raw corpus.
  */
object Ranks {
  val BucketCol = "__rb"
  private val RowPrefixCol = "__rbpre"
  private val GroupTotalCol = "__rbgn"
  private val GroupKeyCol = "__rbg"
  private def valuePrefixCol(v: String) = s"__rbpre_$v"

  /** A range-bucketed, materialized frame pre-joined with its
    * driver-computed prefix columns. Row prefix = #rows in strictly-lower
    * buckets; value prefixes likewise for each requested value column;
    * totals are exact driver longs. */
  final case class RangeBuckets(
      df: DataFrame,
      order: Seq[Column],
      rowTotal: Long,
      valueTotal: Map[String, Long],
      private val valueCols: Seq[String]) {

    private def inBucket = Window.partitionBy(BucketCol).orderBy(order: _*)

    /** Exact global 1-based row_number over the total order. */
    def withRowNumber(out: String): RangeBuckets =
      copy(df = df.withColumn(out,
        col(RowPrefixCol) + row_number().over(inBucket).cast("long")))

    /** Exact global inclusive running sum of `valueCol` (must have been
      * requested in [[Ranks.bucketRange]]'s `valueCols`). */
    def withCumSum(valueCol: String, out: String): RangeBuckets = {
      require(valueCols.contains(valueCol), s"$valueCol not in bucketRange valueCols")
      copy(df = df.withColumn(out,
        col(valuePrefixCol(valueCol)) + sum(col(valueCol))
          .over(inBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long")))
    }

    /** Exact global NTILE(n) from a row_number column added by
      * [[withRowNumber]] — replicates Spark/DuckDB NTILE semantics
      * (first `total % n` tiles get one extra row) from the row number
      * and the driver-known total, all integer arithmetic. */
    def withNtile(rowNumCol: String, n: Int, out: String): RangeBuckets = {
      require(n > 0, "NTILE needs a positive tile count")
      val q = rowTotal / n
      val rem = rowTotal % n
      val boundary = rem * (q + 1) // rows 1..boundary live in the padded tiles
      // CASE is lazy per-row: when q == 0 every row satisfies the first
      // branch (boundary == rowTotal), so the `div q` arm never evaluates.
      copy(df = df.withColumn(out, expr(
        s"CASE WHEN $rowNumCol <= ${boundary}L THEN ($rowNumCol - 1) div ${q + 1}L + 1 " +
          s"ELSE ${rem}L + ($rowNumCol - 1 - ${boundary}L) div ${q}L + 1 END")))
    }

    /** Drop the bookkeeping columns once all statistics are added. */
    def result: DataFrame =
      df.drop(BucketCol +: RowPrefixCol +: valueCols.map(valuePrefixCol): _*)
  }

  /** Range-bucket `df` by `order` (a total order), materialize once, and
    * gather per-bucket counts/sums (≤ `buckets` rows) to build prefix
    * offsets. `valueCols` must be integral (LONG-safe) columns.
    *
    * `buckets = 0` (the default) auto-scales to
    * `max(64, spark.sql.shuffle.partitions)`: a fixed 64 is right on
    * local[32] but would make each bucket sort 1/64th of the input on a
    * 1000-executor cluster — tracking the session's shuffle width keeps
    * per-bucket sorts task-sized at any scale, the driver gather stays
    * bounded by the same knob, and results are invariant to the bucket
    * count (RanksSpec pins 1/7/64/700 bit-identical). */
  def bucketRange(df: DataFrame, order: Seq[Column],
                  valueCols: Seq[String] = Nil, buckets: Int = 0): RangeBuckets = {
    require(buckets >= 0, "buckets must be positive, or 0 for auto")
    val nb =
      if (buckets > 0) buckets
      else math.max(64, df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(nb, order: _*)
      .withColumn(BucketCol, spark_partition_id())
      .lineageCut()
    val aggs = count(lit(1)).cast("long").as("__n") +:
      valueCols.map(v => sum(col(v)).cast("long").as(s"__s_$v"))
    // bounded driver gather: one row per non-empty bucket
    val stats = ranged.groupBy(BucketCol).agg(aggs.head, aggs.tail: _*)
      .orderBy(BucketCol).collect()
    def cell(r: Row, idx: Int): Long = if (r.isNullAt(idx)) 0L else r.getLong(idx)
    val totals = new Array[Long](valueCols.size + 1)
    val prefixRows = stats.map { r =>
      val pres = totals.clone()
      (0 to valueCols.size).foreach(i => totals(i) += cell(r, i + 1))
      Row.fromSeq(r.getInt(0) +: pres.toSeq)
    }
    val schema = StructType(
      StructField(BucketCol, IntegerType) +: StructField(RowPrefixCol, LongType) +:
        valueCols.map(v => StructField(valuePrefixCol(v), LongType)))
    val prefixDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(prefixRows: _*), schema)
    // hashed broadcast probe per row (never a literal-map linear scan)
    RangeBuckets(ranged.join(broadcast(prefixDf), Seq(BucketCol)), order,
      totals(0), valueCols.zipWithIndex.map { case (v, i) => v -> totals(i + 1) }.toMap,
      valueCols)
  }

  private val NullKey = "\u0000NULL"

  /** PER-GROUP order statistics with the same decomposition — for
    * LOW-cardinality group columns (language, source, shard), where a
    * plain `Window.partitionBy(group)` is the hidden twin of the global
    * single-partition window: one dominant group = one task sorting most
    * of the corpus. Range-partitioning on (group, order…) splits every
    * group across buckets (ties broken inside the group's run by the
    * order columns), the in-bucket window partitions by (bucket, group) —
    * task-sized sorts regardless of group skew — and the driver gather is
    * bounded by #buckets + #groups − 1 rows (each bucket holds a
    * contiguous slice, so group/bucket incidences form a staircase).
    * Fail-fast at `maxGroups` gathered pairs: for HIGH-cardinality groups
    * (per-user) the ordinary partitioned window is already task-sized and
    * this decomposition is the wrong tool. */
  final case class GroupedRangeBuckets(
      df: DataFrame,
      groupCol: String,
      order: Seq[Column],
      private val valueCols: Seq[String]) {

    private def inBucket =
      Window.partitionBy(col(BucketCol), col(groupCol)).orderBy(order: _*)

    /** Exact per-group 1-based row_number over the group's total order. */
    def withRowNumber(out: String): GroupedRangeBuckets =
      copy(df = df.withColumn(out,
        col(RowPrefixCol) + row_number().over(inBucket).cast("long")))

    /** Exact per-group inclusive running sum of `valueCol` (must have been
      * requested in [[Ranks.groupedBucketRange]]'s `valueCols`). */
    def withCumSum(valueCol: String, out: String): GroupedRangeBuckets = {
      require(valueCols.contains(valueCol), s"$valueCol not in groupedBucketRange valueCols")
      copy(df = df.withColumn(out,
        col(valuePrefixCol(valueCol)) + sum(col(valueCol))
          .over(inBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long")))
    }

    /** The group's exact total row count as a column (from the gather). */
    def withGroupCount(out: String): GroupedRangeBuckets =
      copy(df = df.withColumn(out, col(GroupTotalCol)))

    def result: DataFrame = df.drop(
      BucketCol +: RowPrefixCol +: GroupTotalCol +: GroupKeyCol +:
        valueCols.map(valuePrefixCol): _*)
  }

  /** See [[GroupedRangeBuckets]]. `groupCol` values are keyed by their
    * string form (a NUL sentinel stands in for SQL NULL). */
  def groupedBucketRange(df: DataFrame, groupCol: String, order: Seq[Column],
                         valueCols: Seq[String] = Nil,
                         buckets: Int = 0, maxGroups: Int = 100000): GroupedRangeBuckets = {
    val nb =
      if (buckets > 0) buckets
      else math.max(64, df.sparkSession.sessionState.conf.numShufflePartitions)
    val ranged = df.repartitionByRange(nb, col(groupCol) +: order: _*)
      .withColumn(BucketCol, spark_partition_id())
      .lineageCut()
    // bounded gather: #buckets + #groups - 1 rows (staircase incidence)
    val aggs = count(lit(1)).cast("long").as("__n") +:
      valueCols.map(v => sum(col(v)).cast("long").as(s"__s_$v"))
    // the fail-fast must bound the GATHER itself, not just check after:
    // limit(maxGroups + 1) makes a high-cardinality misuse (per-user
    // group column on a large corpus) raise the require below instead of
    // collecting millions of stat rows into the driver first. orderBy +
    // limit plans TakeOrderedAndProject, so the retained rows are the
    // ordered head — when the bound holds they are ALL the rows, in order
    val stats = ranged.groupBy(col(groupCol).cast("string").as("__g"), col(BucketCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("__g").asc_nulls_first, col(BucketCol).asc)
      .limit(maxGroups + 1).collect()
    require(stats.length <= maxGroups,
      s"groupedBucketRange gathered more than maxGroups=$maxGroups (group, bucket) pairs; " +
        "high-cardinality groups should use a plain partitioned window (already task-sized)")
    def gKey(r: Row): String = if (r.isNullAt(0)) NullKey else r.getString(0)
    def cell(r: Row, idx: Int): Long = if (r.isNullAt(idx)) 0L else r.getLong(idx)
    // exclusive prefixes within each group; group row totals appended last
    val acc = scala.collection.mutable.HashMap.empty[String, Array[Long]]
    val prefixRows = stats.map { r =>
      val g = gKey(r)
      val tot = acc.getOrElseUpdate(g, new Array[Long](valueCols.size + 1))
      val pres = tot.clone()
      (0 to valueCols.size).foreach(i => tot(i) += cell(r, i + 2))
      (g, r.getInt(1), pres)
    }
    val withTotals = prefixRows.map { case (g, b, pres) =>
      Row.fromSeq(g +: b +: pres.toSeq :+ acc(g)(0))
    }
    val schema = StructType(
      StructField(GroupKeyCol, StringType) +: StructField(BucketCol, IntegerType) +:
        StructField(RowPrefixCol, LongType) +:
        valueCols.map(v => StructField(valuePrefixCol(v), LongType)) :+
        StructField(GroupTotalCol, LongType))
    val prefixDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(withTotals: _*), schema)
    val gExpr = coalesce(col(groupCol).cast("string"), lit(NullKey))
    // hashed broadcast probe on (group-string, bucket) per row — a
    // literal map would linear-scan up to maxGroups entries per row
    val joined = ranged.join(broadcast(prefixDf),
      gExpr === prefixDf(GroupKeyCol) && ranged(BucketCol) === prefixDf(BucketCol))
      .drop(prefixDf(BucketCol))
    GroupedRangeBuckets(joined, groupCol, order, valueCols)
  }

  /** Per-group top-k WITHOUT a per-group corpus sort: each input partition
    * keeps its own local top-k per group (window partitioned by
    * (spark_partition_id, group) — task-sized by construction, and the
    * global top-k is always a subset of the union of local top-ks), then
    * one final window ranks the surviving ≤ k·P rows per group. Right for
    * small k over huge skewed groups; adds `out` = 1..k per group. The
    * order must be total for a deterministic result. */
  def groupedTopK(df: DataFrame, groupCol: String, order: Seq[Column],
                  k: Int, out: String): DataFrame = {
    require(k > 0, "need a positive k")
    val local = df.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number()
        .over(Window.partitionBy(col("__pid"), col(groupCol)).orderBy(order: _*)))
      .filter(col("__lr") <= k)
      .drop("__pid", "__lr")
    local.withColumn(out, row_number()
        .over(Window.partitionBy(col(groupCol)).orderBy(order: _*)).cast("long"))
      .filter(col(out) <= k)
  }
}
