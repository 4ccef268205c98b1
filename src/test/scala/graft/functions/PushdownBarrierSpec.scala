package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
import org.apache.spark.sql.functions._

/** Plan-shape contract for the pushdown barrier: the barrier'd predicate
  * must stay ABOVE the join (a Filter node), never get folded into the
  * join condition — and the control case shows that without the barrier
  * the optimizer DOES push the same predicate down. If a Spark upgrade
  * changes either behavior, this spec fails instead of the dedup/ANN
  * queries silently regressing 2x.
  */
class PushdownBarrierSpec extends SparkTestBase {

  private def frames() = {
    import spark.implicits._
    val l = (0L until 50L).map(i => (i, i)).toDF("id", "a")
    val r = (0L until 50L).map(i => (i, i)).toDF("id2", "b")
    (l, r)
  }

  test("barrier keeps the expensive predicate out of the join condition") {
    val (l, r) = frames()
    val joined = l.join(r, col("id") < col("id2"))
      .filter(PushdownBarrier.long(col("a") * col("b")) >= 10L)
    val plan = joined.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    assert(joins.forall(j =>
        !j.condition.exists(_.toString.toLowerCase.contains("rand"))),
      s"barrier'd predicate leaked into the join condition:\n$plan")
    val barrierFilters = plan.collect {
      case f: Filter if f.condition.toString.toLowerCase.contains("rand") => f
    }
    assert(barrierFilters.nonEmpty, s"no Filter above the join:\n$plan")
    // value-wise the barrier is a no-op
    assert(joined.count() ==
      l.join(r, col("id") < col("id2")).filter(col("a") * col("b") >= 10L).count())
  }

  test("control: without the barrier the optimizer pushes the predicate into the join") {
    val (l, r) = frames()
    val control = l.join(r, col("id") < col("id2"))
      .filter(col("a") * col("b") >= 10L)
    val plan = control.queryExecution.optimizedPlan
    val residualFilters = plan.collect { case f: Filter => f }
    assert(residualFilters.isEmpty,
      s"expected full pushdown in the control plan — the barrier spec is vacuous:\n$plan")
  }
}
