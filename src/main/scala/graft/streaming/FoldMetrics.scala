package graft.streaming

import graft.fold.FoldOption
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Per-fold timing decoration ≅ reference `FoldMetrics`
  * (metrics/.../FoldMetrics.scala:24-38 — fold duration timers around the
  * user fold). The reference wraps the fold in a Prometheus timer; here the
  * decorated fold records application count and cumulative nanos into Spark
  * ACCUMULATORS: executor-side increments merge into the driver per
  * completed task and are readable while the query runs, with no shared-JVM
  * assumption. Semantics are AT-LEAST-ONCE — accumulator updates from
  * transformations are re-applied on task retries and speculative
  * duplicates, so `applyCount`/`totalNanos` can overstate under failures.
  * Treat them as monitoring gauges, not exact counters (assert on them only
  * in retry-free local runs).
  */
final class FoldMetrics private (
    val name: String,
    applies: LongAccumulator,
    totalNanos: LongAccumulator) extends Serializable {

  /** Wrap a fold so every application is counted and timed. */
  def decorate[S, A](fold: FoldOption[S, A]): FoldOption[S, A] =
    FoldOption { (s, a) =>
      val t0 = System.nanoTime()
      try fold.run(s, a)
      finally {
        applies.add(1L)
        totalNanos.add(System.nanoTime() - t0)
      }
    }

  def applyCount: Long = applies.value
  def totalDurationSeconds: Double = totalNanos.value.toDouble / 1e9

  /** Reference-shaped gauges, mergeable into a [[FlowMetrics]] export. */
  def gauges: Map[String, Double] = Map(
    s"fold_${name}_apply_total" -> applyCount.toDouble,
    s"fold_${name}_apply_duration_seconds_sum" -> totalDurationSeconds)
}

object FoldMetrics {
  def apply(spark: SparkSession, name: String = "fold"): FoldMetrics =
    new FoldMetrics(name,
      spark.sparkContext.longAccumulator(s"graft.fold.$name.applies"),
      spark.sparkContext.longAccumulator(s"graft.fold.$name.nanos"))
}
