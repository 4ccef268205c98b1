package graft.streaming

import graft.model.Record
import org.apache.spark.sql.Dataset

/** Record-level pre-processing combinators (reference O17/O18).
  *
  * In the reference these exist because re-keying/filtering must happen
  * inside the partition loop before state lookup
  * (PartitionFlow.scala:151-175); in Spark they are ordinary dataset
  * transformations — `groupByKey` has no co-partitioning constraint, so a
  * remapped key simply shuffles to its new owner.
  */
object RecordOps {

  /** Re-key a record before grouping (reference core/.../RemapKey.scala:8-22).
    * Skipped records still advance offsets/commits exactly like the
    * reference, because Spark's source offsets are tracked independently of
    * the surviving rows. */
  def remapKey(records: Dataset[Record], f: Record => String): Dataset[Record] = {
    import records.sparkSession.implicits._
    records.map(r => r.copy(key = f(r)))
  }

  /** Effectless record predicate applied after remap, before the fold
    * (reference PartitionFlow.scala:39-52,165-175). */
  def filterRecord(records: Dataset[Record], p: Record => Boolean): Dataset[Record] =
    records.filter(p)
}
