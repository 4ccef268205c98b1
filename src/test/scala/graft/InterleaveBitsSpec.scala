package graft

import graft.functions.InterleaveBits
import org.apache.spark.sql.functions._

/** Morton-key kernel vs a bit-by-bit reference, plus the locality
  * property the layout query relies on. */
class InterleaveBitsSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference: place bit i of a at position 2i, bit i of b at 2i+1. */
  private def refMorton(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-number spread equals the bit-by-bit reference") {
    val rnd = new scala.util.Random(42)
    val cases = (for (_ <- 1 to 2000) yield
      (rnd.nextLong() & 0xFFFFFFFFL, rnd.nextLong() & 0xFFFFFFFFL)) ++
      (for (a <- 0L to 8L; b <- 0L to 8L) yield (a, b))
    cases.foreach { case (a, b) =>
      assert(InterleaveBits.morton(a, b) === refMorton(a, b), s"($a, $b)")
    }
  }

  test("codegen path agrees with the interpreted kernel") {
    val df = Seq((3L, 1L), (1999L, 99L), (0L, 0L), (0xFFFFFFFFL, 0xFFFFFFFFL))
      .toDF("a", "b")
      .select(col("a"), col("b"), InterleaveBits(col("a"), col("b")).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === InterleaveBits.morton(r.getLong(0), r.getLong(1)))
    }
  }

  test("z-order locality: a quadrant of the grid is one contiguous z-range") {
    // the 4x4 lower-left quadrant of an 8x8 grid occupies z-codes 0..15
    val codes = for (a <- 0L until 4L; b <- 0L until 4L)
      yield InterleaveBits.morton(a, b)
    assert(codes.sorted === (0L until 16L))
  }

  test("monotone in each dimension at fixed other-bits prefix") {
    assert(InterleaveBits.morton(3, 1) === 7L) // 0b101 | 0b010
    assert(InterleaveBits.morton(0, 1) === 2L)
    assert(InterleaveBits.morton(1, 0) === 1L)
  }
}
