package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch analogue of the reference's
  * timer-built sessions (state + `maxIdle` expiry, reference
  * timer/TimerFlowOf.scala:36-77). Two stacked window expressions over the
  * same (key, order) specification compile to ONE shuffle + ONE sort; no
  * per-key materialization, so it holds at 100 TB.
  */
object Sessionize {

  /** Ordered-funnel analysis — product analytics' flagship sequence
    * query: per key, how deep into `steps` (e.g. view → click →
    * purchase) the event stream progresses, where step i+1 must occur
    * STRICTLY AFTER step i (by `tsMsCol` milliseconds — the house
    * ms-truncation idiom, so both engines tie identically). Emits one
    * row per key: `funnel_depth` (0..steps.length) and `convert_ms`
    * (first-step → last-step latency for full converters, null
    * otherwise).
    *
    * Declarative by construction — NO kernel, no per-key iteration:
    * step i's first-occurrence time is a conditional `min` window over
    * the key partition referencing step i−1's column, so Catalyst plans
    * chained Window nodes over ONE partitioning; the final per-key
    * collapse is a groupBy on the same key, which reuses the exchange —
    * one shuffle total at any scale (PlanAudit-pinned). The same
    * chained-CTE shape runs on any SQL engine, so the oracle is exact. */
  def funnel(events: DataFrame, keyCol: String, tsMsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val w = Window.partitionBy(keyCol)
    val stepCols = steps.indices.map(i => s"__t$i")
    val withSteps = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val hit =
        if (i == 0) when(col(typeCol) === step, col(tsMsCol))
        else when(col(typeCol) === step && col(tsMsCol) > col(stepCols(i - 1)),
          col(tsMsCol))
      df.withColumn(stepCols(i), min(hit).over(w))
    }
    // forward fold so the DEEPEST satisfied step is the outermost CASE
    // branch (t_i set implies t_{i-1} set, but the reverse wrap order
    // would report depth 1 for every converter)
    val depth = steps.indices.foldLeft(lit(0L)) { (acc, i) =>
      when(col(stepCols(i)).isNotNull, lit(i + 1L)).otherwise(acc)
    }
    withSteps
      .withColumn("funnel_depth", depth)
      .withColumn("convert_ms",
        when(col(stepCols.last).isNotNull,
          col(stepCols.last) - col(stepCols.head)))
      .groupBy(keyCol)
      .agg(max("funnel_depth").as("funnel_depth"),
        max("convert_ms").as("convert_ms"))
  }

  /** Adds a 1-based `session_id` column per key: a new session starts when
    * the gap to the previous event (by `tsMsCol`, milliseconds) exceeds
    * `gapMs`. `tiebreakCol` makes ordering total. */
  def byGap(df: DataFrame, keyCol: String, tsMsCol: String, tiebreakCol: String,
            gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsMsCol, tiebreakCol)
    val prev = lag(col(tsMsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsMsCol) - prev > gapMs, 1).otherwise(0)
    df.withColumn("__new_session", isNew)
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
