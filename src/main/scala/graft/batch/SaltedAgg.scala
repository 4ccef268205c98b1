package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation: spread each hot key over `salt`
  * sub-keys, partially aggregate, then combine. Correct for any algebraic
  * aggregate (sum/count/min/max — anything associative+commutative);
  * the salt only changes WHERE partial aggregation happens, never the
  * result. Use when one key holds a disproportionate share of rows and a
  * plain groupBy would pin a single reducer (AQE skew-join handles joins;
  * this is the aggregation analogue).
  */
object SaltedAgg {

  /** Sum + count per key with `salt`-way spreading. The salt is derived
    * from rand(seed) — distribution quality is all that matters; any
    * assignment yields the same final aggregate. */
  def sumCountByKey(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      salt: Int,
      seed: Long = 42L): DataFrame = {
    val salted = df.withColumn("__salt", floor(rand(seed) * salt).cast("int"))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }
}
