package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Core: left rows + packed `__match` struct (null = no right row at or
    * before). The struct-level flag is the correct match signal — a matched
    * right row whose payload fields are all null is still a match, and a
    * right side with no payload columns still works (empty struct). */
  private def asofCore(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String): (DataFrame, Seq[String]) = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTime).toIndexedSeq
    // carry the right timestamp inside the payload so the struct is never
    // field-less and a match is observable even with empty user payload
    val packed = struct(
      (col(rightTime).as("__rt") +: payloadCols.map(c => col(c).as(c))): _*)

    val rPrep = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")
        :+ packed.as("__payload") :+ lit(0).as("__side")): _*)
    val lPrep = left
      .withColumn("__t", col(leftTime))
      .withColumn("__payload", lit(null).cast(rPrep.schema("__payload").dataType))
      .withColumn("__side", lit(1))

    val unioned = lPrep.unionByName(rPrep, allowMissingColumns = true)
    // Tertiary sort on the packed payload struct makes the survivor among
    // right rows sharing (key, timestamp) deterministic across runs and
    // partitionings (max payload by struct ordering wins); without it the
    // running last() would pick whichever tied row happened to sort later.
    // Constraint: payload fields must be orderable (no map columns).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    (filled, payloadCols)
  }

  private def unpack(df: DataFrame, payloadCols: Seq[String],
                     rightPrefix: String): DataFrame =
    payloadCols.foldLeft(df) { (d, c) =>
      d.withColumn(rightPrefix + c, col("__match").getField(c))
    }.drop("__side", "__t", "__payload", "__match")

  def asofLeft(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPrefix: String = "right_"): DataFrame = {
    val (core, payloadCols) = asofCore(left, right, keys, leftTime, rightTime)
    unpack(core, payloadCols, rightPrefix)
  }

  /** Inner variant: keep only left rows that found a match (struct-level
    * null test — independent of payload-field nullability). */
  def asofInner(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String,
                rightPrefix: String = "right_"): DataFrame = {
    val (core, payloadCols) = asofCore(left, right, keys, leftTime, rightTime)
    unpack(core.filter(col("__match").isNotNull), payloadCols, rightPrefix)
  }
}
