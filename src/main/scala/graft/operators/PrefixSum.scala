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
  * The order column must be numeric, NON-NULL and unique (it defines the
  * order; a null has no position, so null keys are rejected up front
  * rather than silently dropped while still inflating bucket offsets).
  */
object PrefixSum {

  /** Adds `out` = sum of `valueCol` over all rows strictly before this row
    * in ascending `orderCol` order (exclusive prefix sum, 0 for the first
    * row). Throws `IllegalArgumentException` if any `orderCol` is null. */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                         out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Single pre-pass aggregate: bounds for the bucket grid + null census
    // (free — same job as the min/max we need anyway).
    val (lo, hi) = df.agg(
      min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long"),
      count(when(col(orderCol).isNull, 1)))
      .collect()(0) match {
        case r if !r.isNullAt(2) && r.getLong(2) > 0 =>
          throw new IllegalArgumentException(
            s"PrefixSum: ${r.getLong(2)} null value(s) in order column " +
            s"`$orderCol`; a null has no position in a total order")
        case r if r.isNullAt(0) => (0L, 0L) // empty input
        case r => (r.getLong(0), r.getLong(1))
      }
    // Saturating span: hi-lo+1 wraps when the range exceeds Long.MaxValue
    // (e.g. keys spanning [Long.MinValue, Long.MaxValue]); clamp instead.
    val span =
      try math.max(1L, math.addExact(math.subtractExact(hi, lo), 1L))
      catch { case _: ArithmeticException => Long.MaxValue }
    val w = math.max(1L, span / n + (if (span % n == 0) 0L else 1L)) // ceil
    // pid = trunc(x/w) - trunc(lo/w): monotone in x, never subtracts two
    // full-range longs (divide-first keeps magnitudes ≤ span/w ≈ n), so it
    // is overflow-safe under ANSI for any long range. Integer DIV, not
    // Column./ (double division; precision-unsafe > 2^53). Identifier is
    // backtick-quoted so dotted/hyphenated column names parse as one name.
    val q = "`" + orderCol.replace("`", "``") + "`"
    val withPid = df.withColumn("__pid",
      expr(s"(CAST($q AS BIGINT) DIV ${w}L) - (${lo}L DIV ${w}L)"))
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

  /** Adds `out` = sum of `valueCol` over all rows strictly before this
    * row in ascending composite `orderCols` order — [[exclusivePrefixSum]]
    * for ARBITRARY orderable composite keys, with no synthetic-single-key
    * ceiling (the `quality·2^24 + doc_id` okey trick caps doc_id at 2^24
    * for uniqueness; a composite (quality, doc_id) ordering has no cap).
    * Same machinery as [[competitionRankByRange]]: range-partition by the
    * key (sampled boundaries absorb skew), pin the assignment with ONE
    * localCheckpoint so the local-cumsum branch and the per-partition-
    * totals branch observe identical partitions, per-partition exclusive
    * window cumsum, and a global offset window over #partitions rows
    * only. The composite key should be a total order (unique) — with
    * ties, which rows count as "before" within the tie group is
    * partition-order-arbitrary. Keys must be non-null. */
  def exclusivePrefixSumByRange(df: DataFrame, orderCols: Seq[String],
                                valueCol: String, out: String): DataFrame = {
    val rp = rangePinned(df, orderCols)
    val localW = Window.partitionBy("__pid").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = rp.withColumn("__local",
      coalesce(sum(col(valueCol)).over(localW), lit(0L)))
    local.join(broadcast(partitionOffsets(rp, sum(col(valueCol)))), Seq("__pid"))
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** The shared composite-key core: range-partition by the key (sampled
    * boundaries absorb frequency skew; equal keys land in ONE partition)
    * and PIN the assignment with one localCheckpoint so every branch
    * built on the result observes identical partitions — the correctness
    * hazard the fixed-grid [[exclusivePrefixSum]] designs away is
    * removed here by the pin; `__pid` is materialized AFTER it so the
    * column is a stable property of the data, not of a re-evaluated
    * exchange. */
  private def rangePinned(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, orderCols.map(col): _*)
      .localCheckpoint()
      .withColumn("__pid", spark_partition_id())
  }

  /** Exclusive cross-partition offsets: fold each partition to ONE row
    * with `agg`, then the only global window runs over #partitions rows. */
  private def partitionOffsets(rp: DataFrame,
                               agg: org.apache.spark.sql.Column): DataFrame = {
    val offW = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    rp.groupBy("__pid").agg(agg.as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(offW), lit(0L)))
      .select("__pid", "__off")
  }

  /** Adds `out` = 1-based COMPETITION rank of this row's composite key
    * `orderCols` (rank = 1 + number of ROWS with a strictly smaller key;
    * rows with equal keys share a rank, and the next distinct key's rank
    * jumps by the group size — so within a tied group the values
    * rank .. rank+groupSize-1 are "reserved", the property prefix-doubling
    * suffix ranking relies on). With `cntOut` set, also emits each row's
    * tie-group size — computed inside the same partitioning, no extra
    * exchange.
    *
    * Unlike [[exclusivePrefixSum]] this accepts ARBITRARY orderable
    * composite keys (strings, multi-column): the rows are range-partitioned
    * by the key (`repartitionByRange` — sampled boundaries absorb key-
    * frequency skew, and equal keys always land in ONE partition, which is
    * what makes the per-partition `rank()` + cross-partition row-count
    * offset exact), pinned with a `localCheckpoint` so the local-rank
    * branch and the per-partition-totals branch observe the SAME partition
    * assignment (the correctness hazard the fixed-grid variant designs
    * away; here the pin removes it at the cost of one materialization).
    * The only global window runs over #partitions rows. Keys must be
    * non-null (nulls would rank first silently; callers coalesce first).
    * The tie flag needs no peer frame: a row's key is shared iff it is
    * not both first-of-group (row_number = rank) and followed by a
    * different rank — all offset functions inside the SAME window spec.
    *
    * Scale: one range exchange of the full input plus the partition-id
    * window — no distinct-key aggregate and no join back (the rank is
    * computed ON the rows). Rank a pre-aggregated key set instead when the
    * input is dominated by a few heavy keys. */
  def competitionRankByRange(df: DataFrame, orderCols: Seq[String],
                             out: String, tiedOut: String = null): DataFrame = {
    val keys = orderCols.map(col)
    val rp = rangePinned(df, orderCols)
    val localW = Window.partitionBy("__pid").orderBy(keys: _*)
    val local = rp.withColumn("__lr", rank().over(localW).cast("long"))
    val withTied =
      if (tiedOut == null) local
      else local
        .withColumn(tiedOut,
          row_number().over(localW).cast("long") > col("__lr") ||
            coalesce(lead(col("__lr"), 1).over(localW) === col("__lr"),
              lit(false)))
    withTied.join(broadcast(partitionOffsets(rp, count(lit(1)))), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lr"))
      .drop("__pid", "__lr")
  }
}
