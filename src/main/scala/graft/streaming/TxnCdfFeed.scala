package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TxnLake

/** Streaming change-data-feed consumer over a TxnLake table — the
  * incremental-MV maintenance loop (x26) run CONTINUOUSLY: every new
  * committed version of the source table is one micro-batch, its change
  * feed ([[TxnLake.changeFeed]]) is the batch's data, and the fold into
  * the downstream MV commits through `commitOnce` keyed by
  * (appId, version). This is the file-source AvailableNow pattern with
  * the lake log as the source: offsets are versions (the log is already a
  * durable, totally-ordered offset sequence, so no separate checkpoint
  * directory is needed), and idempotence lives in the MV table's own
  * transaction state — a crashed/restarted consumer re-reads
  * [[TxnLake.lastTxn]], replays at most one version, and the replay
  * no-ops at the commit.
  *
  * The MV maintained is the x26 per-type aggregate (n, sum_cents), with
  * values quantized to integer cents before summation so incremental
  * application provably reconciles with a full recompute (see x26's
  * scaladoc for why floats can't).
  *
  * Scale: per-version work is [[TxnLake.tableChanges]]'s per-commit
  * delta walk — an append hop reads ONLY that commit's added files, a
  * delete hop only its touched files, maintenance hops read nothing, and
  * only a snapshot replacement pays the full diff join — plus a hash
  * aggregate on the MV key. Maintenance cost scales with change volume,
  * not table size, which is the whole point of consuming a CDF instead
  * of rescanning 100 TB (an earlier draft ran the x25 snapshot-diff join
  * per version: O(table) per hop, the cost this consumer exists to
  * avoid). */
final class TxnCdfFeed(source: String, mvTable: String, appId: String,
                       key: String) {

  private def cents(c: Column) = floor(c * 100 + 0.5).cast("long")

  /** (event_type, dn, dv) delta rows from one version's change feed. */
  private def mvDelta(cdf: DataFrame): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    cdf.select(col("event_type"), sign.as("dn"),
      (sign * cents(col("value"))).as("dv"))
  }

  /** Process every source version not yet applied to the MV — one
    * exactly-once transaction per version, oldest first. Returns the
    * number of versions applied (0 = fully caught up, including after a
    * restart: the resume point is read from the MV table's txn state, so
    * a replayed version no-ops at the commit). */
  def poll(spark: SparkSession): Int = {
    val latest = TxnLake.latestVersion(spark, source).getOrElse(return 0)
    var v = TxnLake.lastTxn(spark, mvTable, appId).map(_ + 1).getOrElse(0L)
    var applied = 0
    while (v <= latest) {
      // batch v's data: the initial snapshot load for version 0 (every
      // row an insert), the version's change feed otherwise
      val delta = mvDelta(
        if (v == 0)
          TxnLake.readVersion(spark, source, 0L)
            .withColumn("change_type", lit("insert"))
        else TxnLake.tableChanges(spark, source, v - 1, v, key)
          .drop("commit_version"))
      val base = TxnLake.read(spark, mvTable)
      val prev =
        if (base.isEmpty)
          delta.select(col("event_type"), col("dn"), col("dv")).limit(0)
        else base.select(col("event_type"), col("n").as("dn"),
          col("sum_cents").as("dv"))
      val next = prev.unionByName(delta)
        .groupBy("event_type")
        .agg(sum(col("dn")).as("n"), sum(col("dv")).as("sum_cents"))
        .filter(col("n") > 0)
      if (TxnLake.commitOnce(spark, next, mvTable, "overwrite", appId, v)
          .nonEmpty) applied += 1
      v += 1
    }
    applied
  }
}
