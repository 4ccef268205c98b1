package graft.batch

import graft.fold.FoldOption
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** Batch execution of an order-sensitive per-key fold — the exact semantics
  * of the reference's journal replay (ordered-by-offset fold per key,
  * reference core/.../FoldToState.scala:39-91, Persistence.scala:178-192),
  * expressed Spark-first:
  *
  *   repartition(key) → sortWithinPartitions(key, offset) → mapPartitions
  *
  * One shuffle, secondary sort handled by Spark's external sorter (spills —
  * no per-group materialization), then each key-run streams through the
  * fold with O(state) memory. This shape survives 100 TB: no
  * `groups.toList`, no driver collect, skew bounded by the external sort.
  */
object OrderedFold {

  /** Fold `ds` per `key` in ascending `order`, returning `(key, finalState)`
    * for every key whose final state is non-None (None = deleted key,
    * reference FoldOption.scala:127-150). */
  def run[A, K, S](ds: Dataset[A])(keyF: A => K, orderF: A => Long)(fold: FoldOption[S, A])(
      implicit triple: Encoder[(K, Long, A)], out: Encoder[(K, S)]): Dataset[(K, S)] = {
    val parts = ds.sparkSession.sessionState.conf.numShufflePartitions
    val step = fold.run // avoid shadowing by Iterator#fold inside the closure
    ds.map(a => (keyF(a), orderF(a), a))(triple)
      .toDF("k", "o", "a")
      .repartition(parts, col("k"))
      .sortWithinPartitions("k", "o")
      .as[(K, Long, A)](triple)
      .mapPartitions { it =>
        val buf = it.buffered
        val runs = new Iterator[(K, Option[S])] {
          def hasNext: Boolean = buf.hasNext
          def next(): (K, Option[S]) = {
            val k = buf.head._1
            var state: Option[S] = None
            while (buf.hasNext && buf.head._1 == k) {
              state = step(state, buf.next()._3)
            }
            (k, state)
          }
        }
        runs.collect { case (k, Some(s)) => (k, s) }
      }(out)
  }
}
