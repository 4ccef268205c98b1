package graft

import org.apache.spark.sql.functions._

/** [[PlanAudit.smjArrayCols]] underpins the 193-row global payload-sort
  * sweep — it must flag a SortMergeJoin that would sort array columns,
  * stay silent when the join is hash-built or broadcast (the r11
  * discipline's approved shapes), and stay silent when column pruning
  * already keeps the arrays out of the join's output. Exercised on real
  * planned trees, not plan strings. */
class SmjArrayDetectorSpec extends SparkTestBase {

  private def sides = {
    import spark.implicits._
    val a = (1 to 50).map(i => (i.toLong, Array.fill(8)(i.toLong))).toDF("id", "arr_a")
    val b = (1 to 50).map(i => (i.toLong, Array.fill(8)(i * 2L))).toDF("id", "arr_b")
    (a, b)
  }

  private def cols(df: org.apache.spark.sql.DataFrame): Seq[String] =
    PlanAudit.smjArrayCols(df.queryExecution.sparkPlan)

  test("merge-hinted join carrying arrays through the sort is flagged with the column names") {
    val (a, b) = sides
    val joined = a.hint("merge").join(b.hint("merge"), "id")
    val flagged = cols(joined)
    assert(flagged.contains("arr_a") && flagged.contains("arr_b"),
      s"expected both array payloads flagged, got $flagged")
  }

  test("shuffle_hash build (the approved re-attach shape) is clean") {
    val (a, b) = sides
    assert(cols(a.join(b.hint("shuffle_hash"), "id")).isEmpty)
  }

  test("broadcast build is clean") {
    val (a, b) = sides
    assert(cols(a.join(broadcast(b), "id")).isEmpty)
  }

  test("merge join whose output prunes the arrays is clean (nothing array-typed is sorted above the join)") {
    val (a, b) = sides
    val pruned = a.hint("merge").join(b.hint("merge"), "id").select("id")
    assert(cols(pruned).isEmpty)
  }
}
