package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators for the cases AQE's runtime skew-join
  * splitting doesn't cover (extreme single-key skew in aggregations; joins
  * where the skewed side can't be split because the other side isn't
  * broadcastable).
  *
  * Both transforms are semantics-preserving: salting only changes the
  * partitioning of intermediate state.
  */
object SkewUtils {

  /** Two-phase (salted partial → final) decomposable aggregation: count and
    * sum per key group. A hot key's rows spread over `salt` partitions in
    * phase 1; phase 2 combines `salt` partials per key — O(keys·salt) rows,
    * never a single-reducer bottleneck. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salt: Int = 16): DataFrame = {
    require(salt > 0)
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("sum_value"))
  }

  /** Salted equi-join for a skewed LEFT side against a non-broadcastable
    * right side: left rows get a per-row salt in [0, salt); the right side
    * replicates `salt`× so every (key, salt) bucket can match. Result is
    * row-identical to the plain join; the shuffle for a hot key spreads
    * over `salt` reducers at the cost of replicating the right side. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // right/full outer would emit each unmatched right row `salt` times
    // (it's replicated before the join) — only left-preserving types are sound
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross").contains(
        joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin does not preserve right/full outer semantics (got $joinType)")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Diagnostic: per-key row counts with skew ratio against the mean —
    * the "should I salt?" probe, computed engine-side. */
  def keySkewProfile(df: DataFrame, keys: Seq[String]): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val stats = counts.agg(avg(col("n")).as("mean_n")).head()
    // empty input → null mean → null ratios (instead of an NPE)
    val mean: java.lang.Double = if (stats.isNullAt(0)) null else stats.getDouble(0)
    counts.withColumn("skew_ratio", round(col("n") / lit(mean), 2))
      .orderBy(col("n").desc)
  }
}
