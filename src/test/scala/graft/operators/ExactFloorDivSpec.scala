package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The decimal remainder-corrected floor division behind the
  * overflow-safe ppm ratios (lift/auc/KS): decimal division ROUNDS
  * (HALF_UP), so without the q·den > num correction every quotient whose
  * fractional part is ≥ .5 reports floor+1. The oracle gate cannot pin
  * this — the test corpora may never produce a round-up fraction — so the
  * boundary lives here, against BigInteger floor division as truth. */
class ExactFloorDivSpec extends SparkTestBase {
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Seq[Long] =
    graft.queries.FoldQueries.exactFloorDiv(
        pairs.toDF("n", "d"),
        "CAST(n AS DECIMAL(38,0))", "CAST(d AS DECIMAL(38,0))", "q")
      .orderBy("n", "d").select("q").collect().map(_.getLong(0)).toSeq

  test("round-up fractions floor instead of rounding (the correction branch)") {
    // 7/2 = 3.5 → decimal cast rounds to 4 → correction must yield 3
    assert(run(Seq((7L, 2L))) == Seq(3L))
    // .999... fractions round up without the correction
    assert(run(Seq((2999L, 3L))) == Seq(999L))
  }

  test("exact multiples and round-down fractions are untouched") {
    assert(run(Seq((6L, 2L), (10L, 3L), (1L, 7L), (0L, 5L))).sorted ==
      Seq(0L, 0L, 3L, 3L))
  }

  test("matches BigInteger floor division across a seeded sweep") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextLong().abs % 1000000007L,
      1L + rnd.nextLong().abs % 99991L)).distinct
    val expect = pairs.sortBy(p => (p._1, p._2)).map { case (n, d) =>
      java.math.BigInteger.valueOf(n)
        .divide(java.math.BigInteger.valueOf(d)).longValueExact()
    }
    assert(run(pairs) == expect)
  }

  test("numerators beyond Long range stay exact through DECIMAL(38,0)") {
    // n·1e6 = 5e24 overflows Long ~500x over; the quotient (5e15 + a
    // round-up fraction that must floor) still fits the BIGINT output
    val got = graft.queries.FoldQueries.exactFloorDiv(
        Seq((5000000000000000003L, 1000000000L)).toDF("n", "d"),
        "CAST(n AS DECIMAL(38,0)) * 1000000", "CAST(d AS DECIMAL(38,0))", "q")
      .select(col("q")).head().getLong(0)
    val expect = java.math.BigInteger.valueOf(5000000000000000003L)
      .multiply(java.math.BigInteger.valueOf(1000000L))
      .divide(java.math.BigInteger.valueOf(1000000000L)).longValueExact()
    assert(got == expect)
  }
}
