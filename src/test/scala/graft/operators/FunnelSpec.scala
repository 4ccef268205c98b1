package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-built truth for the ordered funnel: strict after-ordering, depth
  * is the DEEPEST satisfied step, ms ties break conservatively (a step at
  * the same millisecond does not count as "after"). */
class FunnelSpec extends SparkTestBase {

  test("funnel: ordered depth, strict ties, out-of-order streams, converters") {
    import spark.implicits._
    val events = Seq(
      // clean converter: view 10 -> click 20 -> purchase 30
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // order violated: click precedes the first view -> depth 1
      (2L, "click", 10L), (2L, "view", 20L), (2L, "purchase", 15L),
      // skipped middle step -> depth 1
      (3L, "view", 10L), (3L, "purchase", 20L),
      // never enters the funnel -> depth 0
      (4L, "error", 10L),
      // same-ms click is NOT strictly after the view -> depth 1
      (5L, "view", 10L), (5L, "click", 10L),
      // early stray click ignored; the one after the view counts
      (6L, "view", 10L), (6L, "click", 5L), (6L, "click", 20L), (6L, "purchase", 25L))
      .toDF("user_id", "event_type", "ms")
    val out = Sessionize.funnel(events, "user_id", "ms", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((3L, 20L)),
      2L -> ((1L, -1L)),
      3L -> ((1L, -1L)),
      4L -> ((0L, -1L)),
      5L -> ((1L, -1L)),
      6L -> ((3L, 15L))))
  }

  test("funnel: single-step funnel and repeated completions keep the FIRST times") {
    import spark.implicits._
    val events = Seq(
      (1L, "view", 30L), (1L, "view", 10L),   // first view at 10
      (2L, "click", 10L)).toDF("user_id", "event_type", "ms")
    val out = Sessionize.funnel(events, "user_id", "ms", "event_type", Seq("view"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    // single-step funnel: convert_ms = t0 - t0 = 0 for converters
    assert(out == Map(1L -> ((1L, 0L)), 2L -> ((0L, -1L))))
  }
}
