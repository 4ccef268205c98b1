package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Misra–Gries guarantees, pinned over the distributed aggregate (so
  * map-side partials and merges are part of every claim):
  *
  *  - estimates never exceed the true count;
  *  - undercount bounded by n/(k+1) (n = total items, k = capacity);
  *  - every item with true count > n/(k+1) is present;
  *  - below capacity the summary is lossless (exact counts, all items).
  */
class HeavyHittersSpec extends SparkTestBase {

  private def summary(items: Seq[String], k: Int,
                      partitions: Int): Map[String, Long] = {
    import spark.implicits._
    items.toDF("w").repartition(partitions)
      .agg(MisraGries(col("w"), k).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .as[(String, Long)].collect().toMap
  }

  test("lossless below capacity, regardless of partitioning") {
    val items = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq("c")
    for (p <- Seq(1, 3, 8)) {
      assert(summary(scala.util.Random.shuffle(items), 8, p)
        == Map("a" -> 7L, "b" -> 4L, "c" -> 1L), s"partitions=$p")
    }
  }

  test("MG bounds hold on a skewed stream across merges") {
    // Zipf-ish: item i (1..40) appears ceil(2000/i) times, shuffled
    val items = (1 to 40).flatMap(i => Seq.fill((2000 + i - 1) / i)(s"t$i"))
    val truth = items.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val n = items.size.toLong
    for (k <- Seq(8, 16); p <- Seq(1, 5)) {
      val est = summary(scala.util.Random.shuffle(items), k, p)
      val bound = n / (k + 1)
      est.foreach { case (w, e) =>
        assert(e <= truth(w), s"overcount $w k=$k p=$p")
        assert(truth(w) - e <= bound, s"undercount beyond n/(k+1) for $w k=$k p=$p")
      }
      truth.filter(_._2 > bound).keys.foreach { w =>
        assert(est.contains(w), s"heavy item $w missing at k=$k p=$p")
      }
      assert(est.size <= k, s"capacity exceeded k=$k p=$p")
    }
  }

  test("nulls are skipped; k=1 keeps the majority candidate") {
    import spark.implicits._
    val df = Seq("x", null, "x", "y", null, "x").toDF("w")
    val out = df.agg(MisraGries(col("w"), 1).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .as[(String, Long)].collect().toMap
    // MG with k=1 is the Boyer–Moore majority vote: x survives
    assert(out.keySet == Set("x") && out("x") >= 1L && out("x") <= 3L)
  }
}
