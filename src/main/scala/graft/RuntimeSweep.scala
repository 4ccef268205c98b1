package graft

import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** r13 runtime plan sweep — closes the static sweeps' documented blind
  * spot (PlanAudit sweep comment, VERDICT r12 "What's missing #3"):
  * PlanAudit walks each declared query's FINAL pre-AQE tree, so subplans
  * that execute DURING query construction (eager localCheckpoints,
  * iterative driver loops' per-round jobs, trainer passes) never appear
  * in the tree it audits. Those were covered only by the PLANS.md
  * RDD-lift convention. This listener runs the same public detectors
  * ([[PlanAudit.smjArrayCols]], [[PlanAudit.broadcastOverRddScan]],
  * [[PlanAudit.windowOverSinglePartition]]) over
  * every plan Spark actually EXECUTES: each Dataset action — count,
  * collect, checkpoint, write — fires `onSuccess` with its
  * QueryExecution. The swept tree is each execution's PRE-AQE
  * `sparkPlan` (see [[RuntimeSweep.record]] for why: it is the planner's
  * commitment — AQE's own runtime broadcast demotions are measured-stats
  * decisions that re-make themselves correctly at any scale, and
  * flagging them would punish legitimate adaptivity; a first cut over
  * `executedPlan` flagged 15 such demotions at sf0.01). Hits are matched
  * against the SAME allowlists as the static sweep (one contract, two
  * enforcement points); anything else is recorded as unexplained and
  * fails the sweep's summary. [[Verify]] installs it, so every round's
  * correctness gate doubles as an executed-plan audit, and writes
  * RUNTIME_SWEEP.json (per-query executed-subplan counts + hits). */
class RuntimeSweepListener extends QueryExecutionListener {
  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit =
    RuntimeSweep.record(funcName, qe)
  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()
}

object RuntimeSweep {

  /** Attribution label for subsequent executions — the declared query
    * whose construction/execution is in flight. The harness (Verify)
    * sets it before building each query and drains the listener bus
    * before moving on, so async callbacks can't leak across labels. */
  @volatile var label: String = "(init)"

  final class Rec {
    var executions: Int = 0
    val allowlisted = mutable.LinkedHashSet.empty[String]
    val unexplained = mutable.LinkedHashSet.empty[String]
  }
  private val recs =
    new java.util.concurrent.ConcurrentHashMap[String, Rec]()

  def install(spark: SparkSession): Unit =
    spark.listenerManager.register(new RuntimeSweepListener)

  /** Drain the async listener bus so every execution fired under the
    * current label has been recorded before the label changes. */
  def drain(spark: SparkSession): Unit =
    org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)

  def record(funcName: String, qe: QueryExecution): Unit = {
    val l = label
    // Sweep the execution's PRE-AQE physical plan — the planner's
    // commitment, the same tree the static sweep audits for final plans.
    // NOT executedPlan: under AQE the finalized tree also contains joins
    // AQE demoted to broadcast on MEASURED runtime stage sizes, and those
    // decisions re-make themselves from real sizes at any scale (at
    // 100 TB the stage measures big and stays a shuffle join) — flagging
    // them would punish exactly the runtime adaptivity the plans are
    // allowed to rely on. The hazard class is the PLANNER trusting a
    // checkpoint's unreliable static stats, and that commitment is fully
    // visible in sparkPlan — for construction-time subplans just as for
    // the final query (and sparkPlan carries no WSCG/stage wrappers, so
    // detector descriptions stay comparable with the static allowlist
    // patterns).
    val plan =
      try qe.sparkPlan
      catch { case _: Throwable => return }
    val smj =
      try PlanAudit.smjArrayCols(plan)
      catch { case _: Throwable => Nil }
    val bc =
      try PlanAudit.broadcastOverRddScan(plan)
      catch { case _: Throwable => Nil }
    // third detector (r13 follow-up): a Window/Sort over an Exchange
    // SinglePartition in an executed subplan is the same one-task wall
    // the static global sweep bans in final plans. This one CANNOT run
    // on sparkPlan — exchanges are inserted by EnsureRequirements during
    // preparations, so the pre-preparation tree has no Exchange nodes at
    // all (measured: q_chisq's known pattern is invisible there). It
    // runs on the finalized executedPlan string instead, which is safe
    // for THIS pattern: AQE never introduces a single-partition window
    // that the planner didn't commit (demotions affect joins), and the
    // detector's wrapper walk is unit-tested against AQE stage nesting
    // (PlanAuditDetectorSpec).
    val win =
      try PlanAudit.windowOverSinglePartition(qe.executedPlan.toString)
      catch { case _: Throwable => false }
    if (smj.isEmpty && bc.isEmpty && !win) {
      val rec = recs.computeIfAbsent(l, _ => new Rec)
      rec.synchronized { rec.executions += 1 }
      return
    }
    val rec = recs.computeIfAbsent(l, _ => new Rec)
    rec.synchronized {
      rec.executions += 1
      smj.foreach { c =>
        val ok = PlanAudit.smjArrayAllowlist.get(l).exists { case (_, pat) =>
          pat.r.pattern.matcher(c).matches()
        }
        (if (ok) rec.allowlisted else rec.unexplained) += s"smj-array: $c"
      }
      bc.foreach { d =>
        val ok = (PlanAudit.bcastRddAllowlist.get(l) ++
          PlanAudit.bcastRddAllowlistRuntimeOnly.get(l)).exists {
            case (_, pat) => pat.r.pattern.matcher(d).matches()
          }
        (if (ok) rec.allowlisted else rec.unexplained) += s"bcast-rdd: $d"
      }
      if (win) {
        val ok = PlanAudit.boundedWindowAllowlist.contains(l) ||
          PlanAudit.boundedWindowAllowlistRuntimeOnly.contains(l)
        (if (ok) rec.allowlisted else rec.unexplained) +=
          "single-partition-window: Window/Sort over Exchange SinglePartition"
      }
    }
  }

  def unexplainedTotal: Int = {
    val it = recs.values().iterator(); var n = 0
    while (it.hasNext) { val r = it.next(); r.synchronized { n += r.unexplained.size } }
    n
  }

  def executionsTotal: Int = {
    val it = recs.values().iterator(); var n = 0
    while (it.hasNext) { val r = it.next(); r.synchronized { n += r.executions } }
    n
  }

  /** One JSON object: per-label executed-subplan count + hit lists. */
  def reportJson(): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    import scala.jdk.CollectionConverters._
    val rows = recs.asScala.toSeq.sortBy(_._1).map { case (l, r) =>
      r.synchronized {
        s"${q(l)}: {\"executions\": ${r.executions}" +
          s", \"allowlisted\": [${r.allowlisted.map(q).mkString(",")}]" +
          s", \"unexplained\": [${r.unexplained.map(q).mkString(",")}]}"
      }
    }
    s"""{"detectors": ["smjArrayCols", "broadcastOverRddScan", "windowOverSinglePartition"], "executions_total": $executionsTotal, "unexplained_total": $unexplainedTotal, "queries": {${rows.mkString(", ")}}}"""
  }
}
