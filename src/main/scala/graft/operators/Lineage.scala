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

  /** The conf value we last pointed the context at — an exact-string
    * memo, NOT a substring probe against `sc.getCheckpointDir` (whose
    * qualified `file:/dir/<uuid>` form both false-matches a re-point to
    * a prefix dir and false-misses a scheme-carrying conf value, which
    * would mint a fresh UUID dir on every cut). */
  @volatile private var pointedAt: String = null

  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        if (pointedAt != dir || sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(dir); pointedAt = dir
        }
        // persist -> checkpoint -> unpersist: Dataset.checkpoint(eager)
        // runs a count job AND a separate write job, so an unpersisted
        // expensive subplan would be COMPUTED TWICE per cut (Spark's own
        // RDD.checkpoint doc recommends exactly this persist)
        val pinned = ds.persist()
        try pinned.checkpoint(eager = true)
        finally { pinned.unpersist(); () }
      case _ => ds.localCheckpoint(eager = true)
    }
  }

  /** `ds.lineageCut()` enrichment so call sites read like the
    * `localCheckpoint(true)` they replace. */
  implicit final class LineageOps[T](private val ds: Dataset[T]) extends AnyVal {
    def lineageCut(): Dataset[T] = cut(ds)
  }
}
