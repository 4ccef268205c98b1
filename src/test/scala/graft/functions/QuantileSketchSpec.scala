package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The deterministic-KLL guarantees, pinned over the distributed
  * aggregate (map-side partials + merges are part of every claim):
  *
  *  - below capacity the sketch is the exact sample: every estimate equals
  *    `percentile_disc` (the lower-quantile rule);
  *  - above capacity the RANK error of each estimate is within eps·n
  *    (eps pinned empirically at 4/k for this compactor — theory gives
  *    O(log(n/k)/k) with small constants);
  *  - weight is conserved exactly (the q=0 estimate sits at rank >= 1);
  *  - reruns over the same partitioning are bit-identical (determinism —
  *    the compactor has no RNG).
  */
class QuantileSketchSpec extends SparkTestBase {

  private val QS = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  private def sketch(values: Seq[Long], k: Int, partitions: Int): Map[Double, Long] = {
    import spark.implicits._
    values.toDF("v").repartition(partitions)
      .agg(KllQuantiles(col("v"), k, QS).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.q"), col("e.est"))
      .as[(Double, Long)].collect().toMap
  }

  /** Exact lower quantile: smallest value with rank >= ceil(q*n). */
  private def exact(sorted: IndexedSeq[Long], q: Double): Long =
    sorted(math.max(1, math.ceil(q * sorted.size).toLong).toInt - 1)

  test("exact below capacity, regardless of partitioning") {
    val values = (1L to 200L).map(i => i * 7 % 101)
    val sorted = values.sorted
    for (p <- Seq(1, 3, 8)) {
      val est = sketch(scala.util.Random.shuffle(values), 256, p)
      QS.foreach { q =>
        assert(est(q) == exact(sorted, q), s"q=$q p=$p")
      }
    }
  }

  test("rank error within eps*n above capacity, across merges") {
    // skewed long-tail lengths: the shape doc lengths actually have
    val values = (1 to 50000).map(i => (1000000.0 / i).toLong)
    val sorted = values.sorted.toIndexedSeq
    val n = values.size
    val k = 256
    val eps = 4.0 / k
    for (p <- Seq(1, 8)) {
      val est = sketch(scala.util.Random.shuffle(values), k, p)
      QS.foreach { q =>
        val e = est(q)
        // rank range of the estimate value in the exact ordering
        val lo = sorted.indexWhere(_ >= e) + 1
        val hi = sorted.lastIndexWhere(_ <= e) + 1
        val target = math.max(1L, math.ceil(q * n).toLong)
        val rankErr = if (target < lo) lo - target else if (target > hi) target - hi else 0L
        assert(rankErr <= (eps * n).toLong, s"rank error $rankErr at q=$q p=$p")
      }
    }
  }

  test("deterministic: identical output across reruns") {
    val values = (1 to 20000).map(i => (i * 2654435761L) % 100000)
    val a = sketch(values, 64, 4)
    val b = sketch(values, 64, 4)
    assert(a == b)
  }

  test("nulls skipped; empty input yields empty group row set") {
    import spark.implicits._
    val df = Seq[(String, Option[Long])](("g", Some(5L)), ("g", None), ("g", Some(9L)))
      .toDF("g", "v")
    val out = df.groupBy("g")
      .agg(KllQuantiles(col("v"), 8, Seq(0.5, 1.0)).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.q"), col("e.est"))
      .as[(Double, Long)].collect().toMap
    assert(out == Map(0.5 -> 5L, 1.0 -> 9L))
  }
}
