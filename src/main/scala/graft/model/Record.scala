package graft.model

import java.sql.Timestamp

/** The engine's input envelope — shaped exactly like Spark's Kafka source
  * row, which is itself a 1:1 match for the reference's sole input type
  * `ConsumerRecord[String, ByteVector]` (reference core/src/main/scala/com/
  * evolutiongaming/kafka/flow/package.scala:6-9). Null `key` records are
  * dropped by the engine (reference PartitionFlow.scala:160-164); null
  * `value` is a tombstone.
  */
final case class Record(
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp,
    timestampType: Int,
    key: String,
    value: Array[Byte],
    headers: Map[String, String])

/** Composite entity key namespacing state so several apps can share one
  * store (reference core/.../KafkaKey.scala:6-11). */
final case class KafkaKey(
    applicationId: String,
    groupId: String,
    topic: String,
    partition: Int,
    key: String)

/** State wrapper carrying the input offset up to which the state is
  * current; the offset powers idempotent-replay dedup (reference
  * core/.../snapshot/KafkaSnapshot.scala:13-18, SnapshotFold.scala:17-23).
  */
final case class Snapshot[T](offset: Long, metadata: String, value: T)

object Snapshot {
  def first[T](offset: Long, value: T): Snapshot[T] = Snapshot(offset, "", value)
}
