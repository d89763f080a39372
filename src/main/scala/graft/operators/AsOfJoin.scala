package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) left join: for every left row, attach the payload
  * of the latest right row with the same key whose timestamp is ≤ the left
  * row's timestamp. The operator Spark lacks natively (SURVEY §7.3's
  * "compose existing ops if semantics allow" tier).
  *
  * Implementation: tag both sides, union, then one window pass per key
  * ordered by (time, side) with an ignore-nulls running `last` over the
  * right payload packed in a single struct (atomic fill — per-column fills
  * could mix rows when payload fields are independently null).
  *
  * Scale: exactly ONE hash shuffle on the join keys (the window partition)
  * regardless of time skew — no range-join explosion, no broadcast of
  * either side; within-partition cost is a sort, which is what any
  * merge-based as-of algorithm pays. Right rows sort before left rows on
  * timestamp ties so the ≤ bound is inclusive.
  */
object AsOfJoin {

  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPrefix: String = "right_"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val packed = struct(payloadCols.map(c => col(c).as(c)): _*)

    val rPrep = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")
        :+ packed.as("__payload") :+ lit(0).as("__side")): _*)
    val lPrep = left
      .withColumn("__t", col(leftTime))
      .withColumn("__payload", lit(null).cast(rPrep.schema("__payload").dataType))
      .withColumn("__side", lit(1))

    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned.withColumn("__match",
      last(col("__payload"), ignoreNulls = true).over(w))
    val unpacked = payloadCols.foldLeft(filled) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__match").getField(c))
    }
    unpacked
      .filter(col("__side") === 1)
      .drop("__side", "__t", "__payload", "__match")
  }

  /** Inner variant: keep only left rows that found a match. */
  def asofInner(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String,
                rightPrefix: String = "right_"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val out = asofLeft(left, right, keys, leftTime, rightTime, rightPrefix)
    val anyMatch: Column = payloadCols
      .map(c => col(rightPrefix + c).isNotNull)
      .reduce(_ || _)
    out.filter(anyMatch)
  }
}
