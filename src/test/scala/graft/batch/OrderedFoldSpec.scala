package graft.batch

import graft.SparkTestBase
import graft.fold.FoldOption

final case class Ev(k: String, off: Long, v: Long)

/** Ordered-fold bridge: shuffled input must fold exactly as the offset-
  * ordered sequential fold; None final state deletes the key. */
class OrderedFoldSpec extends SparkTestBase {
  import scala.util.Random

  private val concat = FoldOption.of[String, Ev](e => s"${e.off}")((s, e) => s + "," + e.off)

  test("OrderedFold equals sequential fold in offset order, per key") {
    val rnd = new Random(7)
    val evs = rnd.shuffle(for {
      k <- List("a", "b", "c")
      o <- 0L until 20L
    } yield Ev(k, o, o * 2))
    import spark.implicits._
    val ds = spark.createDataset(evs).repartition(5)
    val out = OrderedFold.run(ds)(_.k, _.off)(concat).collect().toMap
    val expected = evs.groupBy(_.k).map { case (k, es) =>
      k -> es.sortBy(_.off).map(_.off).mkString(",")
    }
    assert(out == expected)
  }

  test("OrderedFold drops keys whose final state is None (delete)") {
    import spark.implicits._
    val evs = List(Ev("keep", 0, 1), Ev("kill", 0, 1), Ev("kill", 1, -1))
    val fold = FoldOption[Long, Ev]((s, e) =>
      if (e.v < 0) None else Some(s.getOrElse(0L) + e.v))
    val out = OrderedFold.run(spark.createDataset(evs))(_.k, _.off)(fold).collect().toMap
    assert(out == Map("keep" -> 1L))
  }

  test("FoldAggregator equals fold for commutative folds") {
    import spark.implicits._
    val evs = (1L to 100L).map(i => Ev(s"k${i % 7}", i, i))
    val count = FoldOption.of[Long, Ev](_ => 1L)((n, _) => n + 1)
    val agg = FoldAggregator(count)(_ + _)
    val out = spark.createDataset(evs).repartition(6)
      .groupByKey(_.k)
      .agg(agg.toColumn.name("n"))
      .collect()
      .toMap
    val expected = evs.groupBy(_.k).map { case (k, es) => k -> Some(es.size.toLong) }
    assert(out == expected)
  }
}
