package graft

import org.apache.spark.sql.functions._

/** Pins the r13 runtime-sweep plumbing end-to-end on the live listener
  * bus: a planted checkpoint-broadcast hazard in a CONSTRUCTION-TIME
  * style action is recorded under the current label, a clean action is
  * counted but not flagged, and the pre-AQE tree is the one swept (the
  * planted broadcast is an explicit `broadcast()` hint, visible in
  * sparkPlan regardless of AQE's runtime choices). The full-surface
  * proof is Verify's own run (387 executed subplans, 0 unexplained —
  * RUNTIME_SWEEP.json); this spec keeps the listener honest at unit
  * grain. */
class RuntimeSweepSpec extends SparkTestBase {

  test("planted checkpoint-broadcast hazard is recorded under the active label; clean actions are counted, not flagged") {
    val s = spark
    import s.implicits._
    RuntimeSweep.install(s)

    val ckpt = s.range(500)
      .select($"id".as("k"), concat(lit("v"), $"id").as("v"))
      .localCheckpoint(true)
    val big = s.range(2000).select(($"id" % 500).as("k"), $"id".as("x"))

    RuntimeSweep.label = "rs_spec_hazard"
    // broadcast build directly over the raw checkpointed scan — the
    // q_lm_score class, planted deliberately
    big.join(broadcast(ckpt), Seq("k")).count()
    RuntimeSweep.drain(s)

    RuntimeSweep.label = "rs_spec_clean"
    // same join hash-built: the approved shape, must not flag
    big.join(ckpt.hint("shuffle_hash"), Seq("k")).count()
    RuntimeSweep.drain(s)

    RuntimeSweep.label = "(rs_spec_done)"
    val json = RuntimeSweep.reportJson()
    assert(json.contains("\"rs_spec_hazard\""), json)
    val hazard = json.split("\"rs_spec_hazard\"")(1).takeWhile(_ != '}')
    assert(hazard.contains("bcast-rdd: BroadcastHashJoin builds over"),
      s"hazard not recorded: $hazard")
    val clean = json.split("\"rs_spec_clean\"")(1).takeWhile(_ != '}')
    assert(clean.contains("\"executions\": 1") || clean.contains("\"executions\": "),
      s"clean action not counted: $clean")
    assert(!clean.contains("bcast-rdd"), s"clean action flagged: $clean")
  }
}
