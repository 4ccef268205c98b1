package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bottom-k is EXACT (unlike the MG/KLL sketches): the k smallest
  * (sort_key, id) pairs of a multiset are independent of partitioning and
  * merge order. Pinned against the brute-force sort path, across
  * partitionings, with duplicate keys and nulls.
  */
class BottomKSpec extends SparkTestBase {

  private def bottomK(rows: Seq[(Long, Long)], k: Int,
                      partitions: Int): Seq[(Long, Long)] = {
    import spark.implicits._
    rows.toDF("key", "id").repartition(partitions)
      .agg(BottomKByKey(col("key"), col("id"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.sort_key"), col("e.id"))
      .as[(Long, Long)].collect().toSeq
  }

  test("equals the sorted prefix, regardless of partitioning") {
    val rows = (1 to 500).map(i => ((i * 2654435761L) % 1000, i.toLong))
    val expected = rows.sorted.take(7)
    for (p <- Seq(1, 3, 16)) {
      assert(bottomK(scala.util.Random.shuffle(rows), 7, p) == expected,
        s"partitions=$p")
    }
  }

  test("duplicate sort keys break ties by id (total-order prefix)") {
    val rows = Seq((5L, 30L), (5L, 10L), (5L, 20L), (1L, 99L), (9L, 1L))
    assert(bottomK(rows, 3, 2) == Seq((1L, 99L), (5L, 10L), (5L, 20L)))
  }

  test("fewer rows than k returns all, sorted") {
    val rows = Seq((3L, 1L), (1L, 2L))
    assert(bottomK(rows, 10, 2) == Seq((1L, 2L), (3L, 1L)))
  }

  test("per-group xxhash64 sample matches the window row_number path") {
    import spark.implicits._
    val df = (1 to 300).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "id")
    val agg = df.groupBy("g")
      .agg(BottomKByKey(xxhash64(col("id")), col("id"), 5).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.id"))
      .as[(String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(xxhash64(col("id")), col("id"))
    val win = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select(col("g"), col("id"))
      .as[(String, Long)].collect().toSet
    assert(agg == win)
  }

  test("null keys and ids are skipped") {
    import spark.implicits._
    val df = Seq[(Option[Long], Option[Long])](
      (Some(5L), Some(1L)), (None, Some(2L)), (Some(1L), None), (Some(2L), Some(3L)))
      .toDF("key", "id")
    val out = df.agg(BottomKByKey(col("key"), col("id"), 10).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.sort_key"), col("e.id"))
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((2L, 3L), (5L, 1L)))
  }
}
