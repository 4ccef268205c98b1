package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transactional parquet publish with snapshot-isolated readers — the
  * batch analogue of the engine's streaming state+offset atomic commit,
  * for the common "recompute a table, swap it in atomically" job.
  *
  * Protocol (manifest-last, rename-committed):
  *  1. data files land under `basePath/data/<uuid>/` — invisible to
  *     readers, because readers only trust manifests;
  *  2. a manifest (one file path per line) is written to a temp name and
  *     COMMITTED via an atomic `rename` to `basePath/_manifests/<v>.json`
  *     where v = highest committed version + 1;
  *  3. if the rename loses a race (target exists), the committer retries
  *     with the next version — data files never move, so a lost race
  *     costs one rename, not a rewrite.
  *
  * Consequences, each pinned by TxnParquetSpec: a crash before commit
  * leaves only an orphan uuid directory that no reader ever sees; readers
  * get snapshot isolation (the manifest they resolved keeps its files —
  * publishes never delete); every historical version remains readable
  * (time travel) until `vacuum` drops manifests and unreferenced files.
  *
  * Rename atomicity holds on HDFS/ABFS/local file systems. On S3-class
  * stores a conditional-put commit (or a log-based protocol à la Delta)
  * replaces step 2 — the manifest-last structure is unchanged.
  */
object TxnParquet {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(base: String) = new Path(base, "_manifests")

  /** Committed versions, ascending (empty if never published). */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val f = fs(spark, base)
    if (!f.exists(manifestDir(base))) Seq.empty
    else f.listStatus(manifestDir(base))
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted.toSeq
  }

  /** Atomically publish `df` as the next version; returns the committed
    * version number. */
  def publish(df: DataFrame, base: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, base)
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = s"$base/data/$uuid"
    df.write.parquet(dataDir)
    val files = f.listStatus(new Path(dataDir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, "publish of an empty write is not allowed")
    f.mkdirs(manifestDir(base))
    val tmp = new Path(manifestDir(base), s".tmp-$uuid")
    val out = f.create(tmp, true)
    out.write(files.mkString("\n").getBytes("UTF-8"))
    out.close()
    // commit loop: rename is atomic and fails if the target exists, so
    // the first committer of a version wins and the loser just tries the
    // next number — data files are never rewritten
    var v = versions(spark, base).lastOption.getOrElse(0L) + 1
    while (!f.rename(tmp, new Path(manifestDir(base), s"$v.json"))) {
      v += 1
    }
    v
  }

  /** Read the newest committed version. */
  def read(spark: SparkSession, base: String): DataFrame =
    readVersion(spark, base,
      versions(spark, base).lastOption.getOrElse(
        throw new IllegalStateException(s"no committed version under $base")))

  /** Time travel: read an exact committed version. */
  def readVersion(spark: SparkSession, base: String, v: Long): DataFrame = {
    val f = fs(spark, base)
    val mf = new Path(manifestDir(base), s"$v.json")
    require(f.exists(mf), s"version $v is not committed under $base")
    val in = f.open(mf)
    val bytes = new Array[Byte](f.getFileStatus(mf).getLen.toInt)
    in.readFully(bytes)
    in.close()
    val files = new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    spark.read.parquet(files: _*)
  }

  /** Change-data feed between two committed versions, keyed by `key`:
    * one full-outer join of the two snapshots (both sides reduce to
    * their key grain by the caller's contract that `key` is unique per
    * version) emitting `op` ∈ insert / delete / update — the
    * q_merge_upsert shape applied to time travel. Rows equal on all
    * columns are omitted. */
  def diff(spark: SparkSession, base: String, key: String,
           fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readVersion(spark, base, fromV)
    val b = readVersion(spark, base, toV)
    val cols = a.columns.toSeq
    require(cols == b.columns.toSeq, "schemas differ between versions")
    val ah = a.select(col(key).as("__k"),
      xxhash64(struct(cols.map(col): _*)).as("__ha"), struct(cols.map(col): _*).as("__a"))
    val bh = b.select(col(key).as("__k"),
      xxhash64(struct(cols.map(col): _*)).as("__hb"), struct(cols.map(col): _*).as("__b"))
    ah.join(bh, Seq("__k"), "full_outer")
      .withColumn("op",
        when(col("__ha").isNull, lit("insert"))
          .when(col("__hb").isNull, lit("delete"))
          .when(col("__ha") =!= col("__hb"), lit("update")))
      .filter(col("op").isNotNull)
      .select(col("__k").as(key), col("op"), col("__a").as("before"), col("__b").as("after"))
  }

  /** Drop manifests older than `keepLast` versions and delete data
    * directories no surviving manifest references. */
  def vacuum(spark: SparkSession, base: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least one version")
    val f = fs(spark, base)
    val vs = versions(spark, base)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    val referenced = keep.flatMap { v =>
      readVersionFiles(spark, base, v)
    }.map(p => new Path(p).getParent.toString).toSet
    drop.foreach(v => f.delete(new Path(manifestDir(base), s"$v.json"), false))
    val dataRoot = new Path(base, "data")
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).filter(_.isDirectory).foreach { st =>
        if (!referenced.contains(st.getPath.toString))
          f.delete(st.getPath, true)
      }
    }
  }

  private def readVersionFiles(spark: SparkSession, base: String, v: Long): Seq[String] = {
    val f = fs(spark, base)
    val mf = new Path(manifestDir(base), s"$v.json")
    val in = f.open(mf)
    val bytes = new Array[Byte](f.getFileStatus(mf).getLen.toInt)
    in.readFully(bytes)
    in.close()
    new String(bytes, "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
  }
}
