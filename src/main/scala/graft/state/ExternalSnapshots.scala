package graft.state

import graft.model.KafkaKey
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** External snapshot store for cross-job state sharing — the Spark
  * re-expression of the reference's Cassandra snapshot table (reference
  * persistence-cassandra/.../SnapshotSchema.scala:22-40,
  * CassandraSnapshots.scala:22-120): keyed by (application_id, group_id,
  * topic, partition, key), value is opaque bytes, upsert is last-write-wins
  * by offset.
  *
  * Inside one streaming job, Spark's checkpoint IS the durable state; this
  * sink exists for the reference's other use case — a different job (or a
  * batch query) reading the latest per-key state. Write path: call
  * `upsert` from `foreachBatch` with the changelog of a microbatch; the
  * store is an append-only parquet log partitioned by (application_id,
  * group_id) whose read path resolves last-write-wins via max_by(offset) —
  * append-only writes scale (no read-modify-write at 100 TB), compaction
  * is `compact()`.
  */
object ExternalSnapshots {

  /** One snapshot row; `value = null` is a tombstone (deleted key) —
    * mirrors the compacted-topic convention (reference
    * KafkaPartitionPersistence.scala:115-122). */
  final case class SnapshotRow(
      application_id: String,
      group_id: String,
      topic: String,
      partition: Int,
      key: String,
      offset: Long,
      metadata: String,
      value: Array[Byte])

  /** Append a microbatch of snapshot rows (last-write-wins resolved at
    * read time — the write is a blind append, like a Cassandra upsert). */
  def upsert(rows: Dataset[SnapshotRow], storeDir: String): Unit =
    rows.write
      .mode(SaveMode.Append)
      .partitionBy("application_id", "group_id")
      .parquet(storeDir)

  /** Latest state per key (tombstones resolved away). This is the
    * recovery read (reference ReadState, Persistence.scala:194-198). */
  def readLatest(spark: SparkSession, storeDir: String,
                 applicationId: String, groupId: String): DataFrame =
    spark.read.parquet(storeDir)
      .filter(col("application_id") === applicationId && col("group_id") === groupId)
      .groupBy("topic", "partition", "key")
      .agg(
        max("offset").as("offset"),
        expr("max_by(metadata, offset)").as("metadata"),
        expr("max_by(value, offset)").as("value"))
      .filter(col("value").isNotNull)

  /** Rewrite the log keeping only the latest row per key — bounded store
    * growth without giving up blind-append writes. */
  def compact(spark: SparkSession, storeDir: String, outDir: String): Unit =
    spark.read.parquet(storeDir)
      .groupBy("application_id", "group_id", "topic", "partition", "key")
      .agg(
        max("offset").as("offset"),
        expr("max_by(metadata, offset)").as("metadata"),
        expr("max_by(value, offset)").as("value"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("application_id", "group_id")
      .parquet(outDir)

  def rowFor(key: KafkaKey, offset: Long, metadata: String, value: Array[Byte]): SnapshotRow =
    SnapshotRow(key.applicationId, key.groupId, key.topic, key.partition, key.key,
      offset, metadata, value)
}
