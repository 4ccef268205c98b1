package graft

import graft.functions.{CmsProbe, MisraGries}
import org.apache.spark.sql.functions._

/** Count-Min probe guarantees on an exact fixture: overcount bound,
  * determinism across partitionings, and the MG/CMS frequency bracket. */
class CmsProbeSpec extends SparkTestBase {
  import spark.implicits._

  // skewed token stream with known exact counts
  private val counts: Map[String, Long] =
    Map("alpha" -> 400L, "beta" -> 120L, "gamma" -> 40L, "delta" -> 7L, "eps" -> 1L)
  private def stream = counts.toSeq.flatMap { case (t, n) => Seq.fill(n.toInt)(t) }
  private val total = counts.values.sum

  private def sketch(parts: Int) =
    stream.toDF("w").repartition(parts)
      .agg(count_min_sketch(col("w"), lit(0.001d), lit(0.99d), lit(42)).as("sk"))

  test("estimates are overcounts within eps*n of the truth") {
    val sk = sketch(4)
    val probes = counts.keys.toSeq.toDF("token")
      .crossJoin(broadcast(sk))
      .select(col("token"), CmsProbe(col("sk"), col("token")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (t, n) =>
      assert(probes(t) >= n, s"$t undercounted")
      assert(probes(t) <= n + (0.001 * total).ceil.toLong + 1, s"$t over the eps bound")
    }
  }

  test("sketch is deterministic across partitionings (commutative merges)") {
    def probe(parts: Int): Seq[Long] =
      counts.keys.toSeq.sorted.toDF("token").crossJoin(broadcast(sketch(parts)))
        .select(CmsProbe(col("sk"), col("token"))).collect().map(_.getLong(0)).toSeq
    assert(probe(1) === probe(8))
  }

  test("unseen items estimate at most eps*n") {
    val est = Seq("zzz").toDF("token").crossJoin(broadcast(sketch(2)))
      .select(CmsProbe(col("sk"), col("token"))).head().getLong(0)
    assert(est >= 0L && est <= (0.001 * total).ceil.toLong + 1)
  }

  test("MG/CMS bracket contains the true frequency") {
    val df = stream.toDF("w").repartition(4)
    val mg = df.agg(MisraGries(col("w"), 3).as("h"))
      .select(explode(col("h")).as("e"))
      .select(col("e.token"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = sketch(4)
    mg.foreach { case (t, lo) =>
      val hi = Seq(t).toDF("token").crossJoin(broadcast(sk))
        .select(CmsProbe(col("sk"), col("token"))).head().getLong(0)
      assert(lo <= counts(t) && counts(t) <= hi, s"bracket broken for $t: [$lo, $hi]")
    }
  }
}
