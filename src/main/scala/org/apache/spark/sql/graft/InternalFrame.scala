package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.types.StructType

/** `private[sql]` access shim (the ColumnBridge pattern): lift an
  * `RDD[InternalRow]` produced by an UnsafeRow-level `mapPartitions`
  * back into a DataFrame without a round-trip through the external Row
  * encoder. Used by the duplicate-span neighbor scan, where the generic
  * RowEncoder deserialize/reserialize of every corpus gram was the
  * measured top-end constant. */
object InternalFrame {
  def ofRows(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
