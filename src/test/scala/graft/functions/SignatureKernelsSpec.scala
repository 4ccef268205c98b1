package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exactness proof for the native signature kernels: each must equal
  * the higher-order-function formulation it replaced (kept here as the
  * reference implementation) on randomized inputs, via DataFrame execution
  * so the codegen path is what's tested.
  */
class SignatureKernelsSpec extends SparkTestBase {

  /** The original 64-x-aggregate SimHash formulation (pre-kernel). */
  private def simhashReference(hashesCol: Column): Column =
    (0 until 64).map { j =>
      val mask = lit(1L << j)
      val vote = aggregate(hashesCol, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(mask) =!= lit(0L), lit(1L)).otherwise(lit(-1L)))
      when(vote > 0, mask).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  /** The original zip_with+aggregate hyperplane formulation (pre-kernel). */
  private def rhpReference(vecCol: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (v, d) => v.cast("double") *
            when(xxhash64(lit(p), d).bitwiseAND(lit(1L)) === lit(0L), lit(1.0))
              .otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)

  test("SimHash64 kernel is bit-identical to the aggregate formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(40) + 1)(rnd.nextLong()))
    } :+ (0L, Seq(0L)) // all-zero hash: every vote negative → sig 0
    val df = rows.toDF("id", "hs")
    val mismatches = df.select(
        SimHash64(col("hs")).as("kernel"),
        simhashReference(col("hs")).as("ref"))
      .filter(col("kernel") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("RhpSignature64 kernel is bit-identical to the zip_with formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(60) + 4)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "vec")
    for (planes <- Seq(8, 16, 64)) {
      val mismatches = df.select(
          RhpSignature64(col("vec"), planes).as("kernel"),
          rhpReference(col("vec"), planes).as("ref"))
        .filter(col("kernel") =!= col("ref")).count()
      assert(mismatches == 0, s"planes=$planes")
    }
  }
}
