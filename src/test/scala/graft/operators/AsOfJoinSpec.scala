package graft.operators

import graft.SparkTestBase

/** As-of join (union + window) against a hand-computed truth table. */
class AsOfJoinSpec extends SparkTestBase {

  test("backward strict picks latest strictly-prior right row per key") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, 100L), // before any right row -> null
      ("u1", 25L, 101L),
      ("u1", 30L, 102L), // equal order to right at 30 -> strict excludes it
      ("u2", 50L, 103L)  // other key
    ).toDF("k", "t", "lid")
    val right = Seq(
      ("u1", 20L, 1L),
      ("u1", 30L, 2L),
      ("u3", 5L, 9L)
    ).toDF("k", "t", "rid")

    val out = AsOfJoin.backward(left, right,
      on = Seq("k"), orderCols = Seq("t"), payload = Seq("rid"), strict = true)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap

    assert(out == Map(100L -> None, 101L -> Some(1L), 102L -> Some(1L), 103L -> None))
  }

  test("backward attaches every payload column from the SAME latest right row, nulls included") {
    import spark.implicits._
    val left = Seq(("u1", 40L, 100L)).toDF("k", "t", "lid")
    // the latest prior right row (t=30) has a NULL payload value; the older
    // row's value (7 at t=20) must NOT leak through, and the two payload
    // columns must not mix rows
    val right = Seq(
      ("u1", 20L, Some(7L), "old"),
      ("u1", 30L, None: Option[Long], "new")
    ).toDF("k", "t", "rv", "tag")
    val out = AsOfJoin.backward(left, right,
      on = Seq("k"), orderCols = Seq("t"), payload = Seq("rv", "tag"), strict = true)
      .select("lid", "rv", "tag").as[(Long, Option[Long], String)].collect().toList
    assert(out == List((100L, None, "new")))
  }

  test("backward non-strict includes right row at equal order") {
    import spark.implicits._
    val left = Seq(("u1", 30L, 102L)).toDF("k", "t", "lid")
    val right = Seq(("u1", 30L, 2L)).toDF("k", "t", "rid")
    val out = AsOfJoin.backward(left, right,
      on = Seq("k"), orderCols = Seq("t"), payload = Seq("rid"), strict = false)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(102L -> Some(2L)))
  }
}
