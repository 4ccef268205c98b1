package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  test("point-in-interval: boundaries inclusive, outside dropped, overlap yields one row per interval") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 300L))
      .toDF("pid", "v")
    // i10 spans several buckets; i20/i30 overlap each other at v=25
    val intervals = Seq((10L, 0L, 100L), (20L, 20L, 30L), (30L, 25L, 40L))
      .toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
        bucketWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L), (2L, 10L), (3L, 10L),  // 0..100 contains 5, 10, 25
      (3L, 20L),                        // 20..30 contains 25 (hi-side in range)
      (3L, 30L)))                       // 25..40 contains 25 (lo boundary inclusive)
    // 300 is outside every interval -> absent entirely
  }

  test("equi key restricts matches; bucket width never changes the result") {
    import spark.implicits._
    val points = Seq(("a", 1L, 15L), ("b", 2L, 15L)).toDF("k", "pid", "v")
    val intervals = Seq(("a", 7L, 10L, 20L)).toDF("k", "iid", "lo", "hi")
    for (w <- Seq(1L, 5L, 1000L)) {
      val out = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
          equiCols = Seq("k"), bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 7L)), s"width $w") // b's point matches no 'b' interval
    }
  }

  test("self-derived intervals resolve (sessionized events rejoin their own source)") {
    import spark.implicits._
    val e = Seq((1L, 100L, 0L), (1L, 200L, 1L), (1L, 999999L, 2L))
      .toDF("user_id", "ms", "event_id")
    val sessions = Sessionize.byGap(e, "user_id", "ms", "event_id", 1000L)
      .groupBy("user_id", "session_id")
      .agg(min("ms").as("s_start"), max("ms").as("s_end"))
    val out = RangeJoin.pointInInterval(e, "ms", sessions, "s_start", "s_end",
        equiCols = Seq("user_id"), bucketWidth = 500L)
      .select("event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L), (1L, 1L), (2L, 2L)))
  }

  test("pathological interval fails fast with a named error, legal intervals under the cap still join") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "v")
    // spans (Long.MaxValue/7) buckets at width 7 — would formerly hit
    // Spark's opaque sequence-length error (or explode rows) mid-job
    val pathological = Seq((99L, 0L, Long.MaxValue)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "v", pathological, "lo", "hi",
        bucketWidth = 7L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("graft.RangeJoin")),
      s"expected the named guard error, got: $ex")

    // widening the cap (or the bucket) makes the same data legal again
    val wide = RangeJoin.pointInInterval(points, "v", pathological, "lo", "hi",
        bucketWidth = Long.MaxValue / 1024)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(wide == Set((1L, 99L)))
  }

  test("range-join plan is an equi-join, not a nested-loop join") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong, i.toLong * 3)).toDF("pid", "v")
    val intervals = (0 until 10).map(i => (i.toLong, i * 30L, i * 30L + 29L)).toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
      bucketWidth = 30L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must be bucketed equi-join, got:\n$plan")
  }
}
