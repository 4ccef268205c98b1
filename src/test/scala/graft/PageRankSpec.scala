package graft

import graft.operators.Graph

/** PageRank against a dense local power iteration with the identical
  * update rule (uniform dangling redistribution, fixed alpha). */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Local reference: same semantics as Graph.pageRank. */
  private def ref(edges: Seq[(Long, Long, Double)], alpha: Double, iters: Int): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dMass = nodes.filterNot(outW.contains).map(rank).sum
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => rank(s) * w / outW(s) }.sum
      }
      val base = (1.0 - alpha) / n + alpha * dMass / n
      rank = nodes.map(v => v -> (base + alpha * contrib.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long, Double)], alpha: Double = 0.85,
                  iters: Int = 20): Map[Long, Double] =
    Graph.pageRank(edges.toDF("s", "d", "w"), "s", "d", Some("w"),
      alpha = alpha, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("3-cycle is uniform and sums to 1") {
    val r = run(Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0)))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("star with dangling center matches the dense reference") {
    val edges = Seq((2L, 1L, 1.0), (3L, 1L, 1.0), (4L, 1L, 1.0)) // 1 is dangling
    val expect = ref(edges, 0.85, 20)
    val got = run(edges)
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // dangling mass recycled
    expect.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"node $k") }
    assert(got(1L) > got(2L)) // center outranks leaves
  }

  test("edge weights steer rank (weighted contributions)") {
    // 1 splits 3:1 between 2 and 3; both return to 1
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
    val expect = ref(edges, 0.85, 20)
    val got = run(edges)
    expect.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"node $k") }
    assert(got(2L) > got(3L))
  }

  test("chain with early convergence still sums to 1") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 2L, 1.0))
    val got = run(edges, iters = 40)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }
}
