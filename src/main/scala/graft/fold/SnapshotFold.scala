package graft.fold

import graft.model.Snapshot

/** Offset-dedup guard for idempotent replay: a record is folded only when
  * its offset is strictly greater than the offset already captured in the
  * snapshot (reference core/.../snapshot/SnapshotFold.scala:10-24). This is
  * what makes re-processing a journal/log prefix a no-op.
  */
object SnapshotFold {

  def apply[S, A](offsetOf: A => Long)(inner: FoldOption[S, A]): FoldOption[Snapshot[S], A] =
    FoldOption { (snap, a) =>
      snap match {
        case Some(sn) if offsetOf(a) <= sn.offset => snap
        case _ =>
          inner.run(snap.map(_.value), a).map(v => Snapshot(offsetOf(a), "", v))
      }
    }

  /** Sequence-number variant: dedup on a per-record seqNr carried in the
    * payload; records without a seqNr are skipped silently (reference
    * kafka-journal/.../JournalFold.scala:16-33). */
  def explicitSeqNr[S, A](seqNrOf: A => Option[Long], stateSeqNr: S => Long)(
      inner: FoldOption[S, A]): FoldOption[S, A] =
    FoldOption { (state, a) =>
      seqNrOf(a) match {
        case None => state
        case Some(nr) =>
          state match {
            case Some(s) if nr <= stateSeqNr(s) => state
            case _ => inner.run(state, a)
          }
      }
    }
}
