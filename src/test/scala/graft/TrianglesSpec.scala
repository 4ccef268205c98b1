package graft

import graft.operators.Graph

/** Degree-oriented triangle enumeration vs a brute-force local reference,
  * plus the input-hygiene cases (duplicates, reversed edges, self-loops)
  * and the skewed-hub graph that motivates degree orientation. */
class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Graph.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Brute force: every id-sorted node triple whose three edges all exist
    * in the canonicalized undirected edge set. */
  private def ref(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val e = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if e((a, b)) && e((a, c)) && e((b, c))
    } yield (a, b, c)).toSet
  }

  test("single triangle, mixed edge directions") {
    assert(run(Seq((2L, 1L), (2L, 3L), (1L, 3L))) == Set((1L, 2L, 3L)))
  }

  test("duplicates, reversed duplicates, and self-loops canonicalize away") {
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(run(e) == Set((1L, 2L, 3L)))
  }

  test("star hub has no triangles; closing one rim edge makes exactly one") {
    val star = (1L to 40L).map(i => (0L, i))
    assert(run(star) == Set.empty)
    assert(run(star :+ (7L, 8L)) == Set((0L, 7L, 8L)))
  }

  test("K5 has C(5,3)=10 triangles, each exactly once") {
    val k5 = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val got = run(k5)
    assert(got.size == 10)
    assert(got == ref(k5))
  }

  test("seeded random graph matches brute force (degree ties included)") {
    val rnd = new scala.util.Random(42)
    // ~25% density on 24 nodes: plenty of triangles and plenty of degree
    // ties, so both orientation branches (deg, then id tiebreak) exercise
    val edges = for {
      a <- 1L to 24L; b <- (a + 1) to 24L if rnd.nextDouble() < 0.25
    } yield if (rnd.nextBoolean()) (a, b) else (b, a)
    val expect = ref(edges)
    assert(expect.nonEmpty, "degenerate fixture")
    assert(run(edges) == expect)
  }

  test("ids near 2^62 do not overflow the middle-vertex selection") {
    // regression (r10 ADVICE): the middle vertex used to be computed as
    // x+y+z-least-greatest, which overflows Long for large ids (hashed
    // node ids routinely land here). Sum of these three ids ≈ 3*2^62 > 2^63.
    val base = (1L << 62) + 5L
    val (a, b, c) = (base, base + 1L, base + 2L)
    assert(run(Seq((b, a), (b, c), (a, c))) == Set((a, b, c)))
  }

  test("hub-heavy skewed graph matches brute force") {
    // two hubs wired to every rim node + a rim cycle: the id-oriented
    // wedge set at the hubs is quadratic, the degree-oriented one linear —
    // correctness here is what lets q_triangles claim that shape safely
    val rim = (10L to 29L)
    val hubs = rim.flatMap(i => Seq((1L, i), (2L, i))) :+ (1L, 2L)
    val cycle = rim.zip(rim.tail :+ rim.head).map { case (a, b) => (a, b) }
    val edges = hubs ++ cycle
    assert(run(edges) == ref(edges))
  }
}
