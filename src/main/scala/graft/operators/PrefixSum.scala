package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum (exclusive running total in a global
  * ordering) — the two-pass algorithm that replaces the single-reducer
  * `Window.orderBy(...)` with no partition spec:
  *
  *  1. range-partition by the order column; each partition computes its
  *     LOCAL exclusive cumsum (keyed window, fully parallel);
  *  2. the per-partition totals (one row per partition) get their own
  *     running offset — the only global window runs over #partitions rows,
  *     not #rows — and broadcast-join back.
  *
  * Output values are independent of where the range boundaries land, so
  * sampling nondeterminism in the range partitioner cannot change results.
  * The order column must be unique (it defines the global order).
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
    // checkpointed: both the local-cumsum branch and the totals branch must
    // see the SAME partition assignment — repartitionByRange samples range
    // boundaries, and a re-execution could draw different ones, silently
    // corrupting offsets. cache() only best-effort pins this (an evicted
    // block recomputes under fresh sampling); localCheckpoint truncates the
    // lineage so re-sampling is impossible. A production cluster run would
    // use reliable checkpoint() for executor-loss safety.
    val ranged = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localW = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__local",
      coalesce(sum(col(valueCol)).over(localW), lit(0L)))
    val offW = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid").agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select("__pid", "__off")
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local")
  }
}
