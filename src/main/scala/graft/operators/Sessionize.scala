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
