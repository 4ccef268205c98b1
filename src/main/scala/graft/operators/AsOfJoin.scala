package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the latest
  * right row (by `orderCols`) with order < (strict) or <= (non-strict) the
  * left row's, within the same equi-key.
  *
  * Implemented as union + one ordered window instead of an inequality join:
  * a range/theta join explodes row pairs and defeats hash partitioning,
  * while this shape is ONE shuffle on the key, an external sort, and a
  * linear scan — it survives skew and 100 TB inputs. (Operator absent from
  * both the reference and Spark built-ins; SURVEY.md §2.8.)
  */
object AsOfJoin {

  /** @param on        equi-key column names present on both sides
    * @param orderCols ordering columns present on both sides (their tuple
    *                  should be unique per side for determinism)
    * @param payload   right-side columns to attach to each left row
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      orderCols: Seq[String],
      payload: Seq[String],
      strict: Boolean = true): DataFrame = {

    val leftSide = if (strict) 0 else 1
    val rightSide = 1 - leftSide
    val leftOut = left.columns.toSeq

    // Align both sides on (leftCols ++ __p ++ __side); absent columns
    // become typed nulls so unionByName stays schema-exact. The payload
    // travels as ONE struct: right rows carry a non-null struct (even when
    // every payload VALUE is null), left rows a null struct.
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__side", lit(leftSide))

    val extraLeft = leftOut.diff(on ++ orderCols)
    val r = extraLeft.foldLeft(
        right.select((on ++ orderCols).map(col) :+
          struct(payload.map(col): _*).as("__p"): _*)) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.withColumn("__side", lit(rightSide))

    val cols = (leftOut :+ "__p" :+ "__side").map(col)
    val unioned = l.select(cols: _*).unionByName(r.select(cols: _*))

    // Rows frame ending at the current row: at equal order values the side
    // tag decides strictness (left-first ⇒ right-at-equal excluded).
    val w = Window
      .partitionBy(on.map(col): _*)
      .orderBy(orderCols.map(col) :+ col("__side"): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // ONE ignoreNulls fill of the whole struct: every payload column comes
    // from the SAME (latest) right row. Filling columns independently would
    // skip a matching right row whose value is genuinely NULL and silently
    // mix values from different right rows.
    val filled = unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    val unpacked = payload.foldLeft(filled) { (df, p) =>
      df.withColumn(p, col("__p").getField(p))
    }
    unpacked.filter(col("__side") === leftSide).drop("__side", "__p")
  }
}
