package graft.operators

import org.apache.spark.sql.Dataset

/** The lineage-truncation seam every iterative / reused-subplan operator
  * rides (connected components' per-round rebase, BPE's per-merge corpus,
  * Ranks' bucket maps, the eager-checkpoint-before-self-join house rule).
  *
  * Default = `localCheckpoint(eager)`: blocks live on executors — fast,
  * no durable storage needed, and the right choice for local runs and
  * for clusters that prefer retry-the-job on executor loss. BUT local
  * checkpoint blocks are NOT fault-tolerant: losing the executor that
  * holds one kills the job, because the truncated lineage cannot be
  * recomputed (this is Spark's own documented caveat).
  *
  * Setting `spark.graft.checkpoint.dir` (any Hadoop-visible path —
  * HDFS/S3 on a real cluster) switches EVERY cut in the library to
  * reliable `checkpoint(eager)` against that directory: executor loss
  * mid-iteration then recovers by re-reading the checkpoint files
  * instead of aborting (demonstrated by ExecutorLossSmoke on the
  * connected-components path). The price is a write+read through the
  * checkpoint store per cut — pay it when the operator's runtime is
  * long enough that restarting the whole job on a lost executor costs
  * more, which is exactly the 100 TB regime. Long iterative loops on a
  * shared dir should also set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
  * superseded round checkpoints are reaped.
  *
  * One seam, not thirty call sites, so the strategy can never be half
  * switched.
  */
object Lineage {

  /** Session conf key; empty/absent = localCheckpoint. */
  val ConfKey = "spark.graft.checkpoint.dir"

  /** A SparkContext has ONE checkpoint dir: concurrent sessions on the
    * same context with DIFFERENT ConfKey values contend (last set wins
    * for in-flight cuts) — point all sessions of a context at one
    * reliable dir. The check below is derived from the context's actual
    * state (not a JVM memo), so it survives context restarts and
    * third-party setCheckpointDir calls, and it compares the qualified
    * PARENT of the context's `<dir>/<uuid>` to the qualified conf value
    * — exact, so a stable conf never re-mints a UUID dir per cut. */
  private def pointContextAt(
      sc: org.apache.spark.SparkContext, dir: String): Unit = synchronized {
    val wanted = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(sc.hadoopConfiguration).makeQualified(p)
    }
    val currentParent = sc.getCheckpointDir
      .map(d => new org.apache.hadoop.fs.Path(d).getParent)
    if (!currentParent.contains(wanted)) sc.setCheckpointDir(dir)
  }

  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        pointContextAt(spark.sparkContext, dir)
        // persist -> checkpoint -> unpersist: Dataset.checkpoint(eager)
        // runs a count job AND a separate write job, so an unpersisted
        // expensive subplan would be COMPUTED TWICE per cut (Spark's own
        // RDD.checkpoint doc recommends exactly this persist). If the
        // CALLER already persisted, leave their cache alone — Spark
        // caching is not reference-counted, and an unpersist here would
        // be a mode-dependent perf cliff on their later actions.
        if (ds.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
          ds.checkpoint(eager = true)
        else {
          val pinned = ds.persist()
          try pinned.checkpoint(eager = true)
          finally { pinned.unpersist(); () }
        }
      case _ => ds.localCheckpoint(eager = true)
    }
  }

  /** `ds.lineageCut()` enrichment so call sites read like the
    * `localCheckpoint(true)` they replace. */
  implicit final class LineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    def lineageCut(): Dataset[T] = cut(ds)
  }
}
