package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transactional parquet publish with snapshot-isolated readers — the
  * batch analogue of the engine's streaming state+offset atomic commit,
  * for the common "recompute a table, swap it in atomically" job.
  *
  * Protocol (manifest-last, claim-arbitrated, rename-committed):
  *  1. data files land under `basePath/data/<uuid>/` — invisible to
  *     readers, because readers only trust manifests;
  *  2. a manifest (one file path per line) is written to a temp name
  *     (`.tmp-<uuid>`, ignored by readers);
  *  3. the committer CLAIMS a version by create-exclusive of
  *     `basePath/_manifests/<v>.claim` starting at v = highest committed
  *     version + 1, incrementing on every claim miss — exclusivity comes
  *     from O_CREAT|O_EXCL (java.nio on local paths, `create(path,
  *     overwrite=false)` on HDFS-class stores, both atomic server-side),
  *     NEVER from rename-refuses-existing-target semantics, which
  *     RawLocalFileSystem does not reliably provide (java.io.File
  *     .renameTo → POSIX rename(2) overwrites silently);
  *  4. the claim winner renames its temp manifest onto `<v>.json` — the
  *     target cannot exist (only the claim holder writes it), so the
  *     rename is pure atomic content publication; data files never move
  *     and a lost claim costs one create attempt, not a rewrite.
  *
  * Consequences, each pinned by TxnParquetSpec: a crash before commit
  * leaves only an orphan uuid directory / tmp manifest / claim that no
  * reader ever sees (a dead claim just makes later committers skip that
  * number — versions may have gaps); readers get snapshot isolation (the
  * manifest they resolved keeps its files — publishes never delete);
  * every historical version remains readable (time travel) until `vacuum`
  * drops manifests, claims, stale tmp manifests, and unreferenced files.
  * `vacuum` concurrent with an in-flight `publish` is not supported (it
  * may delete the publisher's tmp manifest; the publish then fails
  * cleanly — nothing is half-committed).
  *
  * On S3-class stores a conditional-put commit (if-none-match — the same
  * claim primitive) or a log-based protocol à la Delta replaces step 3 —
  * the manifest-last structure is unchanged.
  */
object TxnParquet {

  /** Post-rename overtake re-publishes allowed before [[commitFrom]]
    * declares the store pathologically contended. Each legitimate
    * iteration is one lost race against a DIFFERENT concurrent commit —
    * 20 in a row means publishers are mutually overtaking in lockstep,
    * and every further round writes another duplicate manifest. */
  private[state] val MaxOvertakeRepublishes = 20

  /** Pre-rename claim retries allowed before [[claimAndRename]] gives up.
    * Each legitimate iteration means a DIFFERENT committer published a
    * newer version between our claim and the re-scan; the loop is
    * lock-free (system-wide progress is guaranteed — someone committed),
    * but THIS caller could in principle starve forever under sustained
    * contention. Failing loudly here is safe: nothing has been renamed
    * yet, so no duplicate or orphan manifest exists — the caller simply
    * retries when contention subsides. Same discipline as
    * [[MaxOvertakeRepublishes]] on the post-rename window. */
  private[state] val MaxClaimRetries = 1000

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
    commitFrom(f, base, tmp, versions(spark, base).lastOption.getOrElse(0L) + 1)
  }

  /** Atomically claim `claim` via create-exclusive. True O_EXCL on local
    * paths (java.nio — Hadoop's local `create(overwrite=false)` is
    * check-then-act); HDFS-class stores enforce `overwrite=false`
    * atomically server-side. Returns false iff the claim already exists. */
  private def claimVersion(f: FileSystem, claim: Path): Boolean = {
    val scheme = claim.toUri.getScheme
    if (scheme == null || scheme == "file") {
      try { java.nio.file.Files.createFile(java.nio.file.Paths.get(claim.toUri.getPath)); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { f.create(claim, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException => if (f.exists(claim)) false else throw e
      }
    }
  }

  private def committedMax(f: FileSystem, base: String): Long =
    if (!f.exists(manifestDir(base))) 0L
    else f.listStatus(manifestDir(base))
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .flatMap(_.stripSuffix(".json").toLongOption)
      .foldLeft(0L)(math.max)

  /** Commit step, separated so the two-committers-same-version race is
    * deterministically testable: claim the first free version >= `startV`
    * (create-exclusive — the race's linearization point), then publish the
    * manifest content with one rename onto the claimed, guaranteed-free
    * target.
    *
    * Overtake re-check: if another committer CLAIMED a higher number and
    * already COMMITTED it while we sat between our claim and our rename
    * (GC pause, slow fs), renaming our lower version would "succeed" yet
    * never be the newest snapshot — publish-then-read would not see the
    * write. So after winning a claim we re-scan committed versions and
    * slide ABOVE any newer commit (abandoning the claim — vacuum reaps
    * it). That still leaves the few-instruction window between the
    * re-scan and the rename, so AFTER the rename we re-scan once more:
    * if a higher version committed inside the window, the same content is
    * RE-PUBLISHED above it (the overtaken manifest stays readable —
    * publishes never delete — so the rare race costs one duplicate
    * snapshot, never a lost newest). Each extra iteration requires a
    * fresh concurrent commit to land inside a re-scan→rename window, but
    * two re-publishing committers can in principle overtake EACH OTHER
    * (every iteration is itself a commit that re-triggers the peer), each
    * round writing another duplicate manifest — so the loop is BOUNDED at
    * [[MaxOvertakeRepublishes]] and fails loudly past it naming what is
    * and is not durable, instead of ping-ponging manifests until the
    * contention happens to break. The returned version is guaranteed to
    * have been the newest committed snapshot at some instant after its
    * rename — `read()` after `publish()` always sees the write. */
  private[state] def commitFrom(f: FileSystem, base: String, tmp: Path,
                                startV: Long): Long = {
    var v = claimAndRename(f, base, tmp, startV)
    var newest = committedMax(f, base)
    var republishes = 0
    while (newest > v) {
      republishes += 1
      if (republishes > MaxOvertakeRepublishes)
        throw new IllegalStateException(
          s"graft.TxnParquet: overtaken $republishes times in a row " +
            s"publishing to $base — the store is pathologically contended. " +
            s"The content IS durable at version $v (readVersion($v)), but " +
            "read-your-write via read() could not be established; retry " +
            "when contention subsides or serialize the publishers")
      // overtaken inside the re-scan→rename window: replay the committed
      // manifest bytes into a fresh tmp and commit them above the overtaker
      val bytes = readManifestBytes(f, new Path(manifestDir(base), s"$v.json"))
      val tmp2 = new Path(manifestDir(base),
        s".tmp-${java.util.UUID.randomUUID().toString}")
      val out = f.create(tmp2, true)
      out.write(bytes)
      out.close()
      v = claimAndRename(f, base, tmp2, newest + 1)
      newest = committedMax(f, base)
    }
    v
  }

  /** One claim→rename pass: claim the first free version >= `startV`,
    * slide above anything that committed meanwhile, rename onto the
    * claimed target. Returns the renamed version (which may still be
    * overtaken inside the final window — `commitFrom` re-checks). */
  private def claimAndRename(f: FileSystem, base: String, tmp: Path,
                             startV: Long): Long = {
    var v = startV
    var claimed = false
    var retries = 0
    while (!claimed) {
      retries += 1
      if (retries > MaxClaimRetries)
        throw new IllegalStateException(
          s"graft.TxnParquet: claim starved $retries times in a row " +
            s"publishing to $base — concurrent committers kept landing " +
            "newer versions between every claim and re-scan. Nothing was " +
            "renamed (no duplicate or orphan manifest exists); retry when " +
            "contention subsides or serialize the publishers")
      // skip versions whose manifest already exists (an out-of-band
      // committer that bypassed claims) as well as claimed ones — never
      // depend on rename refusing an existing target
      while (f.exists(new Path(manifestDir(base), s"$v.json")) ||
          !claimVersion(f, new Path(manifestDir(base), s"$v.claim"))) v += 1
      val newest = committedMax(f, base)
      if (newest >= v) v = newest + 1 else claimed = true
    }
    val target = new Path(manifestDir(base), s"$v.json")
    require(!f.exists(target), s"manifest $v appeared without a claim — refusing to clobber")
    require(f.rename(tmp, target),
      s"manifest rename failed for version $v (concurrent vacuum?)")
    v
  }

  private def readManifestBytes(f: FileSystem, mf: Path): Array[Byte] = {
    val in = f.open(mf)
    val bytes = new Array[Byte](f.getFileStatus(mf).getLen.toInt)
    in.readFully(bytes)
    in.close()
    bytes
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
    * columns are omitted. Update detection compares the row structs
    * directly (null-safe) — the already-shipped values, no hash proxy
    * and so no collision blind spot. */
  def diff(spark: SparkSession, base: String, key: String,
           fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readVersion(spark, base, fromV)
    val b = readVersion(spark, base, toV)
    val cols = a.columns.toSeq
    require(cols == b.columns.toSeq, "schemas differ between versions")
    val ah = a.select(col(key).as("__k"), struct(cols.map(col): _*).as("__a"))
    val bh = b.select(col(key).as("__k"), struct(cols.map(col): _*).as("__b"))
    ah.join(bh, Seq("__k"), "full_outer")
      .withColumn("op",
        when(col("__a").isNull, lit("insert"))
          .when(col("__b").isNull, lit("delete"))
          .when(!(col("__a") <=> col("__b")), lit("update")))
      .filter(col("op").isNotNull)
      .select(col("__k").as(key), col("op"), col("__a").as("before"), col("__b").as("after"))
  }

  /** Drop manifests older than `keepLast` versions, delete data
    * directories no surviving manifest references, and clean the commit
    * machinery's leftovers: orphan `.tmp-*` manifests (writers that died
    * before commit) and `.claim` files at or below the newest committed
    * version (claims that can no longer arbitrate anything — committers
    * always start above the newest `.json`). Not supported concurrently
    * with an in-flight publish (see protocol note). */
  def vacuum(spark: SparkSession, base: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least one version")
    val f = fs(spark, base)
    val vs = versions(spark, base)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    val referenced = keep.flatMap { v =>
      readVersionFiles(spark, base, v)
    }.map(p => new Path(p).getParent.toString).toSet
    drop.foreach(v => f.delete(new Path(manifestDir(base), s"$v.json"), false))
    val newest = vs.lastOption.getOrElse(0L)
    if (f.exists(manifestDir(base))) {
      f.listStatus(manifestDir(base)).map(_.getPath).foreach { p =>
        val n = p.getName
        val staleClaim = n.endsWith(".claim") &&
          n.stripSuffix(".claim").toLongOption.exists(_ <= newest)
        if (n.startsWith(".tmp-") || staleClaim) f.delete(p, false)
      }
    }
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
