package graft.fold

import graft.model.Snapshot
import org.scalatest.funsuite.AnyFunSuite

/** Combinator laws of the fold algebra (mirrors the reference's behavioral
  * unit specs, core/src/test/.../FoldSpec.scala). Property-style: each law
  * is checked over 100 seeded random samples.
  */
class FoldSpec extends AnyFunSuite {

  private def forAll[T](gen: scala.util.Random => T)(check: T => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach(_ => check(gen(rnd)))
  }
  private def intList(r: scala.util.Random): List[Int] =
    List.fill(r.nextInt(30))(r.nextInt(2001) - 1000)
  private def longList(r: scala.util.Random): List[Long] =
    List.fill(r.nextInt(30))((r.nextInt(2001) - 1000).toLong)

  private val sum = Fold[Long, Long](_ + _)

  test("contramap pre-transforms input") {
    forAll(intList) { xs =>
      val f = sum.contramap[Int](_.toLong * 2)
      val r = xs.foldLeft(0L)(f.run)
      assert(r == xs.map(_.toLong * 2).sum)
    }
  }

  test("contramap composes (f andThen g)") {
    forAll(intList) { xs =>
      val f1 = sum.contramap[Int](_.toLong).contramap[Int](_ + 1)
      val f2 = sum.contramap[Int](x => (x + 1).toLong)
      assert(xs.foldLeft(0L)(f1.run) == xs.foldLeft(0L)(f2.run))
    }
  }

  test("filter skips non-matching input, state unchanged") {
    forAll(longList) { xs =>
      val f = sum.filter(_ % 2 == 0)
      assert(xs.foldLeft(0L)(f.run) == xs.filter(_ % 2 == 0).sum)
    }
  }

  test("contraCollect = filter + map") {
    forAll(intList) { xs =>
      val f = sum.contraCollect[Int] { case x if x > 0 => x.toLong }
      assert(xs.foldLeft(0L)(f.run) == xs.filter(_ > 0).map(_.toLong).sum)
    }
  }

  test("flatMap applies the input again with the chosen fold") {
    // base counts; flatMap adds x when running count is even
    val base = Fold[(Long, Long), Long]((s, _) => (s._1 + 1, s._2))
    val addWhenEven = Fold[(Long, Long), Long]((s, x) => (s._1, s._2 + x))
    val f = base.flatMap(s => if (s._1 % 2 == 0) addWhenEven else Fold((st, _) => st))
    val r = List(10L, 20L, 30L, 40L).foldLeft((0L, 0L))(f.run)
    assert(r == ((4L, 20L + 40L)))
  }

  test("productR applies both folds in order") {
    val f = Fold[List[String], String]((s, a) => s :+ ("L:" + a)) *>
      Fold[List[String], String]((s, a) => s :+ ("R:" + a))
    assert(f.run(Nil, "x") == List("L:x", "R:x"))
  }

  test("handleErrorWith recovers state on failure") {
    val boom = Fold[Long, Long]((s, a) => if (a < 0) throw new IllegalStateException() else s + a)
    val f = boom.handleErrorWith((s, _) => s - 1)
    assert(List(1L, -5L, 2L).foldLeft(0L)(f.run) == 1 - 1 + 2)
  }

  test("transformState is a lens round-trip") {
    forAll(longList) { xs =>
      val f = sum.transformState[String](_.toString, _.toLong)
      assert(xs.foldLeft("0")(f.run) == xs.sum.toString)
    }
  }

  test("set and modify") {
    assert(Fold.set[Long, String](7L).run(1L, "x") == 7L)
    assert(Fold.modify[Long, String](_ * 2).run(3L, "x") == 6L)
  }

  test("FoldOption: None out deletes, of() initializes") {
    val count = FoldOption.of[Long, String](_ => 1L)((n, _) => n + 1)
    assert(count.run(None, "a") == Some(1L))
    assert(count.run(Some(4L), "a") == Some(5L))
    val delete = FoldOption[Long, String]((_, _) => None)
    assert((count *> delete).run(Some(1L), "a") == None)
  }

  test("FoldOption filter leaves absent state absent") {
    val count = FoldOption.of[Long, String](_ => 1L)((n, _) => n + 1).filter(_ == "keep")
    assert(count.run(None, "drop") == None)
    assert(count.run(None, "keep") == Some(1L))
  }

  test("SnapshotFold dedups replayed offsets (idempotent replay)") {
    val inner = FoldOption.of[Long, (Long, Long)](_._2)((s, a) => s + a._2)
    val f = SnapshotFold[Long, (Long, Long)](_._1)(inner)
    val log = List((0L, 10L), (1L, 20L), (1L, 20L), (0L, 10L), (2L, 5L))
    val r = log.foldLeft(Option.empty[Snapshot[Long]])(f.run)
    assert(r == Some(Snapshot(2L, "", 35L)))
  }

  test("SnapshotFold.explicitSeqNr skips missing and stale seqNrs") {
    final case class St(seq: Long, n: Long)
    val inner = FoldOption[St, (Option[Long], Long)]((s, a) =>
      Some(St(a._1.get, s.map(_.n).getOrElse(0L) + a._2)))
    val f = SnapshotFold.explicitSeqNr[St, (Option[Long], Long)](_._1, _.seq)(inner)
    val log = List(
      (Some(1L), 10L), (None, 99L), (Some(1L), 10L), (Some(2L), 20L), (Some(2L), 20L))
    val r = log.foldLeft(Option.empty[St])(f.run)
    assert(r == Some(St(2L, 30L)))
  }

  test("EnhancedFold lifts a FoldOption and ignores extras") {
    val count = FoldOption.of[Long, String](_ => 1L)((n, _) => n + 1)
    val ef = EnhancedFold.fromFold(count)
    val extras = new KeyFlowExtras
    assert(ef.run(extras, None, "a") == Some(1L))
  }

  test("Tick/TickOption compose; remove deletes") {
    val t = Tick[Long](_ + 1).andThen(Tick(_ * 2))
    assert(t.run(3L) == 8L)
    assert(TickOption.remove[Long].run(Some(3L)) == None)
    assert(TickOption.id[Long].run(Some(3L)) == Some(3L))
  }
}
