package graft.fold

/** The aggregation kernel: `(S, A) => S` plus the reference's combinator
  * surface (reference core/.../Fold.scala:14-136). Synchronous by design —
  * Spark update functions are synchronous; effects become exceptions plus
  * task retry, so the reference's `F[_]` disappears rather than being
  * emulated.
  */
final case class Fold[S, A](run: (S, A) => S) { self =>

  /** Pre-transform input (reference Fold.scala:24-36), e.g. decode bytes. */
  def contramap[B](f: B => A): Fold[S, B] =
    Fold((s, b) => run(s, f(b)))

  /** Bidirectional state lens (reference Fold.scala:47-67); used to attach
    * offset metadata around a user state. */
  def transformState[T](to: S => T, from: T => S): Fold[T, A] =
    Fold((t, a) => to(run(from(t), a)))

  /** Sequential composition: apply `a`, then apply it again with a second
    * fold chosen from the updated state (reference Fold.scala:78-84). */
  def flatMap(f: S => Fold[S, A]): Fold[S, A] =
    Fold { (s, a) =>
      val s1 = run(s, a)
      f(s1).run(s1, a)
    }

  /** Apply this fold, then `that` (reference Fold.scala:86-91). */
  def productR(that: Fold[S, A]): Fold[S, A] =
    Fold((s, a) => that.run(run(s, a), a))

  def *>(that: Fold[S, A]): Fold[S, A] = productR(that)

  /** Skip the input when the predicate is false (reference Fold.scala:94-106;
    * the reference exposes both input-only and state-aware variants). */
  def filter(p: A => Boolean): Fold[S, A] =
    Fold((s, a) => if (p(a)) run(s, a) else s)

  def filterS(p: (S, A) => Boolean): Fold[S, A] =
    Fold((s, a) => if (p(s, a)) run(s, a) else s)

  /** Partial-function filter+map of the input (reference Fold.scala:109-113). */
  def contraCollect[B](pf: PartialFunction[B, A]): Fold[S, B] =
    Fold((s, b) => if (pf.isDefinedAt(b)) run(s, pf(b)) else s)

  /** Recover the state on a failing step (reference Fold.scala:119-122). */
  def handleErrorWith(f: (S, Throwable) => S): Fold[S, A] =
    Fold { (s, a) =>
      try run(s, a)
      catch { case e: Throwable if scala.util.control.NonFatal(e) => f(s, e) }
    }

  /** Side-effecting observation (reference Fold.scala:134-136). */
  def tap(f: (S, A) => Unit): Fold[S, A] =
    Fold { (s, a) => f(s, a); run(s, a) }
}

object Fold {
  /** Constant fold (reference Fold.scala:128). */
  def set[S, A](s: S): Fold[S, A] = Fold((_, _) => s)

  /** Pure state modification ignoring the input (reference Fold.scala:131). */
  def modify[S, A](f: S => S): Fold[S, A] = Fold((s, _) => f(s))
}

/** Fold over optional state: `None` in = "key unseen", `None` out =
  * "delete this key" (reference core/.../FoldOption.scala:10-150). This is
  * the user-facing aggregation surface of the engine.
  */
final case class FoldOption[S, A](run: (Option[S], A) => Option[S]) { self =>

  def contramap[B](f: B => A): FoldOption[S, B] =
    FoldOption((s, b) => run(s, f(b)))

  def transformState[T](to: S => T, from: T => S): FoldOption[T, A] =
    FoldOption((t, a) => run(t.map(from), a).map(to))

  def flatMap(f: Option[S] => FoldOption[S, A]): FoldOption[S, A] =
    FoldOption { (s, a) =>
      val s1 = run(s, a)
      f(s1).run(s1, a)
    }

  def productR(that: FoldOption[S, A]): FoldOption[S, A] =
    FoldOption((s, a) => that.run(run(s, a), a))

  def *>(that: FoldOption[S, A]): FoldOption[S, A] = productR(that)

  def filter(p: A => Boolean): FoldOption[S, A] =
    FoldOption((s, a) => if (p(a)) run(s, a) else s)

  def filterS(p: (Option[S], A) => Boolean): FoldOption[S, A] =
    FoldOption((s, a) => if (p(s, a)) run(s, a) else s)

  def contraCollect[B](pf: PartialFunction[B, A]): FoldOption[S, B] =
    FoldOption((s, b) => if (pf.isDefinedAt(b)) run(s, pf(b)) else s)

  def handleErrorWith(f: (Option[S], Throwable) => Option[S]): FoldOption[S, A] =
    FoldOption { (s, a) =>
      try run(s, a)
      catch { case e: Throwable if scala.util.control.NonFatal(e) => f(s, e) }
    }

  def tap(f: (Option[S], A) => Unit): FoldOption[S, A] =
    FoldOption { (s, a) => f(s, a); run(s, a) }
}

object FoldOption {
  /** Lift a total fold with an initial state. */
  def of[S, A](init: A => S)(fold: (S, A) => S): FoldOption[S, A] =
    FoldOption((s, a) => Some(s.fold(init(a))(st => fold(st, a))))

  def empty[S, A]: FoldOption[S, A] = FoldOption((s, _) => s)
}

/** Timer-driven state transition — no input record (reference
  * core/.../Tick.scala:7-31). */
final case class Tick[S](run: S => S) {
  def andThen(that: Tick[S]): Tick[S] = Tick(s => that.run(run(s)))
}

object Tick {
  def id[S]: Tick[S] = Tick(identity)
}

/** Tick over optional state; `None` out deletes the key (reference
  * core/.../TickOption.scala:6-34). */
final case class TickOption[S](run: Option[S] => Option[S]) {
  def andThen(that: TickOption[S]): TickOption[S] = TickOption(s => that.run(run(s)))
}

object TickOption {
  def id[S]: TickOption[S] = TickOption(identity)

  /** Delete the key unconditionally. */
  def remove[S]: TickOption[S] = TickOption(_ => None)
}

/** Framework callbacks available to an enhanced fold (reference
  * core/.../KeyFlowExtras.scala:16-25). Under Spark's per-microbatch atomic
  * state+offset commit, "request additional persist" is subsumed by a
  * stronger guarantee, so the shim records the request for observability
  * only.
  */
final class KeyFlowExtras private[graft] () extends Serializable {
  @volatile private[graft] var persistRequests: Long = 0L
  def requestAdditionalPersist(): Unit = { persistRequests += 1 }
  /** Task-local count of persist requests (observability only). */
  def persistRequestCount: Long = persistRequests
}

/** Fold that also receives framework callbacks (reference
  * core/.../EnhancedFold.scala:20-48). */
final case class EnhancedFold[S, A](run: (KeyFlowExtras, Option[S], A) => Option[S]) {
  def toFoldOption(extras: KeyFlowExtras): FoldOption[S, A] =
    FoldOption((s, a) => run(extras, s, a))
}

object EnhancedFold {
  /** Lift a plain FoldOption, ignoring the extras (reference
    * EnhancedFold.scala:40-43). */
  def fromFold[S, A](fold: FoldOption[S, A]): EnhancedFold[S, A] =
    EnhancedFold((_, s, a) => fold.run(s, a))
}
