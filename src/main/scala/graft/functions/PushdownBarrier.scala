package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Optimizer barrier for expensive post-join predicates.
  *
  * `PushdownBarrier.long(c) >= threshold` is value-wise identical to
  * `c >= threshold` (the rand term is multiplied by zero), but it makes the
  * predicate NON-DETERMINISTIC, which legally forbids Catalyst from pushing
  * it through the join into the join condition. Used where the predicate's
  * input (an exact Jaccard / cosine over large arrays) costs far more than
  * the join's cheap guards: pushed down, it runs for every candidate pair
  * BEFORE the cheap guards prune (measured 2x slower at sf0.1).
  *
  * Kept as one named, spec-asserted helper (PushdownBarrierSpec) because
  * the trick is optimizer-version-fragile: if a future Spark starts moving
  * non-deterministic filters, the plan-shape spec fails loudly instead of
  * the queries silently regressing.
  */
object PushdownBarrier {

  /** Barrier around a long-typed column. */
  def long(c: Column): Column = c + (rand(7) * lit(0.0)).cast("long")

  /** Barrier around a double-typed column. */
  def double(c: Column): Column = c + rand(7) * lit(0.0)
}
