package graft.state

import graft.model.KafkaKey
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.concurrent.duration.FiniteDuration

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
  *
  * STORE FORMAT: values are [[Compressor]]-framed (1-byte marker +
  * passthrough or LZ4 block) since r10 — `upsert` writes frames,
  * `readLatest` decodes them, `compact` passes them through. A directory
  * written by a pre-framing `upsert` (raw value bytes) is NOT readable by
  * this `readLatest`: re-upsert it through the current writer. No such
  * store ships with the repo; this note exists so the format change is a
  * documented migration, not a silent corruption.
  */
object ExternalSnapshots {

  /** One snapshot row; `value = null` is a tombstone (deleted key) —
    * mirrors the compacted-topic convention (reference
    * KafkaPartitionPersistence.scala:115-122). `written_at_ms` is the
    * write timestamp powering record expiration (the analogue of
    * Cassandra's writetime/TTL, reference RecordExpiration /
    * CassandraKeys.scala:146). */
  final case class SnapshotRow(
      application_id: String,
      group_id: String,
      topic: String,
      partition: Int,
      key: String,
      offset: Long,
      metadata: String,
      value: Array[Byte],
      written_at_ms: Long)

  /** LZ4 threshold matching the reference's external-state compressor
    * (persistence/compression/Compressor.scala:27-96): values at or above
    * it are LZ4-block-compressed, smaller ones pass through — either way
    * the stored frame is self-describing (1-byte marker), so the read
    * path needs no side channel ("passthrough detection on read"). */
  val CompressionThresholdBytes = 10000

  /** Append a microbatch of snapshot rows (last-write-wins resolved at
    * read time — the write is a blind append, like a Cassandra upsert).
    * Values are framed by [[Compressor]] before landing: parquet's own
    * page compression does not help the consumer that reads ONE key's
    * bytes out of the store, and large states (the only ones the
    * threshold engages) cross systems here. Tombstones stay null. */
  def upsert(rows: Dataset[SnapshotRow], storeDir: String,
             compressionThreshold: Int = CompressionThresholdBytes): Unit = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val c = new Compressor(compressionThreshold)
      it.map(r => if (r.value == null) r else r.copy(value = c.compress(r.value)))
    }.write
      .mode(SaveMode.Append)
      .partitionBy("application_id", "group_id")
      .parquet(storeDir)
  }

  /** Latest state per key (tombstones resolved away). This is the
    * recovery read (reference ReadState, Persistence.scala:194-198).
    *
    * `expiration` ≅ reference `RecordExpiration`: keys whose LATEST write
    * is older than the duration read as absent — the TTL analogue of
    * Cassandra's per-row TTL (reference CassandraKeys.scala:146,204-208),
    * enforced at read time (and purged physically by [[compact]]). */
  def readLatest(spark: SparkSession, storeDir: String,
                 applicationId: String, groupId: String,
                 expiration: Option[FiniteDuration] = None,
                 nowMs: Long = System.currentTimeMillis()): DataFrame = {
    val latest = spark.read.parquet(storeDir)
      .filter(col("application_id") === applicationId && col("group_id") === groupId)
      .groupBy("topic", "partition", "key")
      .agg(
        max("offset").as("offset"),
        expr("max_by(metadata, offset)").as("metadata"),
        expr("max_by(value, offset)").as("value"),
        expr("max_by(written_at_ms, offset)").as("written_at_ms"))
      .filter(col("value").isNotNull)
    val live = expiration.fold(latest)(ttl =>
      latest.filter(col("written_at_ms") >= lit(nowMs - ttl.toMillis)))
    // decompress AFTER last-write-wins + TTL resolution: only surviving
    // rows pay the decode; the frame marker routes raw vs LZ4 per value
    val schema = live.schema
    val vIdx = schema.fieldIndex("value")
    live.mapPartitions { it =>
      val c = new Compressor()
      it.map { row =>
        val vals = new Array[Any](row.length)
        var i = 0
        while (i < row.length) { vals(i) = row.get(i); i += 1 }
        vals(vIdx) = c.decompress(row.getAs[Array[Byte]](vIdx))
        new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
          : org.apache.spark.sql.Row
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Rewrite the log keeping only the latest row per key — bounded store
    * growth without giving up blind-append writes. With `expiration`,
    * expired keys are physically purged (the Cassandra-compaction
    * analogue of TTL'd-row removal). Values stay in their stored frames
    * (no decode+re-encode pass): the compacted store is read by
    * [[readLatest]], whose per-value frame marker does the routing. */
  def compact(spark: SparkSession, storeDir: String, outDir: String,
              expiration: Option[FiniteDuration] = None,
              nowMs: Long = System.currentTimeMillis()): Unit = {
    val latest = spark.read.parquet(storeDir)
      .groupBy("application_id", "group_id", "topic", "partition", "key")
      .agg(
        max("offset").as("offset"),
        expr("max_by(metadata, offset)").as("metadata"),
        expr("max_by(value, offset)").as("value"),
        expr("max_by(written_at_ms, offset)").as("written_at_ms"))
    expiration.fold(latest)(ttl =>
        latest.filter(col("written_at_ms") >= lit(nowMs - ttl.toMillis)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("application_id", "group_id")
      .parquet(outDir)
  }

  def rowFor(key: KafkaKey, offset: Long, metadata: String, value: Array[Byte],
             writtenAtMs: Long = System.currentTimeMillis()): SnapshotRow =
    SnapshotRow(key.applicationId, key.groupId, key.topic, key.partition, key.key,
      offset, metadata, value, writtenAtMs)
}
