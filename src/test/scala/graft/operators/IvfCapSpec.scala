package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the r13 IVF fit-sample cap identity claim: `seedStableCap`
  * selects EXACTLY the rows a bare `orderBy(xxhash64).limit(n)` would —
  * on both sides of the 3n branch point — while the large branch
  * pre-cuts with a hash-value threshold filter so the global sort never
  * sees the corpus (the runtime plan sweep's q_ann_ivf catch). */
class IvfCapSpec extends SparkTestBase {

  private def corpus(rows: Long) = {
    val s = spark
    import s.implicits._
    s.range(rows).select(array(($"id" % 997).cast("float"),
      ($"id" / 997).cast("float")).as("vec"))
  }

  private def bare(df: org.apache.spark.sql.DataFrame, seed: Long, n: Int) =
    df.orderBy(xxhash64(col("vec"), lit(seed))).limit(n)

  test("large corpus: pre-cut branch selects the identical top-n and plans the threshold filter") {
    val base = corpus(350000)
    val capped = IvfIndex.seedStableCap(base, "vec", seed = 42L, n = 1000)
    assert(capped.queryExecution.sparkPlan.toString.contains("Filter"),
      "the 3n branch must plan the hash-value pre-cut filter")
    val got = capped.collect().map(_.getSeq[Float](0)).toSet
    val want = bare(base, 42L, 1000).collect().map(_.getSeq[Float](0)).toSet
    assert(got.size == 1000 && got == want)
  }

  test("small corpus: uncut branch, identical selection") {
    val base = corpus(2500)
    val capped = IvfIndex.seedStableCap(base, "vec", seed = 7L, n = 1000)
    val got = capped.collect().map(_.getSeq[Float](0)).toSet
    val want = bare(base, 7L, 1000).collect().map(_.getSeq[Float](0)).toSet
    assert(got.size == 1000 && got == want)
  }
}
