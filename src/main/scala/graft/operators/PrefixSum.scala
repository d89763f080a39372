package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum (exclusive running total in a global
  * ordering) — the two-pass algorithm that replaces the single-reducer
  * `Window.orderBy(...)` with no partition spec:
  *
  *  1. bucket rows by the order column; each bucket computes its LOCAL
  *     exclusive cumsum (keyed window, fully parallel);
  *  2. the per-bucket totals (one row per bucket) get their own running
  *     offset — the only global window runs over #buckets rows, not
  *     #rows — and broadcast-join back.
  *
  * Bucket assignment is DETERMINISTIC: `__pid = (orderCol - min) div w`
  * with a fixed width `w = ceil(span / n)` computed from a min/max
  * aggregate. The obvious alternative, `repartitionByRange`, draws its
  * range boundaries from a random sample, so the two plan branches
  * (local cumsum and bucket totals) can observe DIFFERENT partition
  * assignments unless the ranged input is pinned with a checkpoint —
  * a correctness hazard this formulation removes outright (and with it
  * the localCheckpoint materialization + storage-block cleanup).
  *
  * Trade-off: fixed-width buckets balance only when the order column is
  * roughly uniform over its range (dense ids, timestamps). Heavily
  * clustered keys skew some buckets; for those, pre-map the key to a
  * rank-like proxy or raise `partitions`. Skew affects only balance,
  * never values: the result is a pure function of (orderCol, valueCol).
  * The order column must be numeric and unique (it defines the order).
  */
object PrefixSum {

  /** Adds `out` = sum of `valueCol` over all rows strictly before this row
    * in ascending `orderCol` order (exclusive prefix sum, 0 for the first
    * row). */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val Array(lo, hi) = df.agg(
      min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long"))
      .collect()(0) match {
        case r if r.isNullAt(0) => Array(0L, 0L) // empty input
        case r => Array(r.getLong(0), r.getLong(1))
      }
    val span = math.max(1L, hi - lo + 1L)
    val w = math.max(1L, (span + n - 1) / n) // ceil(span / n)
    // integer DIV, not Column./ (double division; precision-unsafe > 2^53)
    val withPid = df.withColumn("__pid",
      expr(s"(CAST($orderCol AS BIGINT) - ${lo}L) DIV ${w}L"))
    val localW = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withPid.withColumn("__local",
      coalesce(sum(col(valueCol)).over(localW), lit(0L)))
    val offW = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy("__pid").agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local")
  }
}
