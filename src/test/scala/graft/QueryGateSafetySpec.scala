package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Every declared query must survive the driver's correctness gate, which
  * loads each output into pandas and sorts/hashes EVERY column — including
  * rows-only outputs. Two regression classes this pins (both shipped in r6):
  *
  *  - a non-atomic output column (array/map/struct) crashes the driver's
  *    `sort_values` (`TypeError: unhashable numpy.ndarray` on
  *    q_doc_profile_fast's raw minhash signature);
  *  - a query whose plan no longer ANALYZES against the driver's parquet
  *    (the regenerated testdata moved events.ts from TIMESTAMP(NANOS) to
  *    TIMESTAMP(MICROS) and 8 events queries silently vanished from the
  *    gate — Verify caught the exception, wrote nothing, and the driver
  *    never saw the query).
  *
  * Building the DataFrame (analysis) against sf0.001 catches both without
  * executing anything big.
  */
class QueryGateSafetySpec extends SparkTestBase {
  private val sfDir = "/root/testdata/sf0.001"

  private def nonAtomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every declared query analyzes and emits only gate-sortable columns") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val schema = fn(spark, sfDir).schema
        val cols = schema.fields.filter(f => nonAtomic(f.dataType))
        if (cols.isEmpty) Nil
        else List(s"$name: non-atomic output column(s) " +
          cols.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      } catch {
        case e: Throwable => List(s"$name: does not analyze: ${e.getMessage}")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("every oracle key has a matching declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
