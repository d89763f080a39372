package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Commit-time data-quality expectations over a [[TxnLake]] table — the
  * Delta Live Tables `EXPECT … ON VIOLATION` contract: every incoming row
  * is evaluated against a set of named boolean constraints; rows passing
  * ALL of them commit to the target table, rows failing ANY are diverted
  * to a sibling quarantine table carrying the comma-joined (sorted) names
  * of the constraints they violated. Nothing is silently dropped — the
  * quarantine is itself a transactional table, so violation triage gets
  * time travel, stats, and skipping like any other data.
  *
  * The reference's only validation is a conjunctive range filter that
  * discards failures (process_bronze_to_silver.py:82 semantics); this is
  * the auditable form a 100 TB ingest needs.
  *
  * Scale: the constraint columns are one codegen'd projection; the split
  * is two filtered writes off that projection (each a full scan of `df` —
  * callers ingesting an expensive upstream should persist it first, the
  * same contract as any multi-action DataFrame reuse). Quarantine volume
  * is violation-bounded, typically ≪ input.
  */
object Expectations {

  final case class Expectation(name: String, predicate: Column)

  final case class ExpectationResult(version: Long,
                                     quarantineVersion: Option[Long],
                                     passed: Long, quarantined: Long)

  /** Quarantine table path for `table`. */
  def quarantinePath(table: String): String = table + "_quarantine"

  /** Shared evaluation: one projection computes every verdict (sort_array
    * makes the label deterministic regardless of declaration order; a
    * constraint evaluating to NULL counts as a violation — the DLT
    * `EXPECT` rule, not SQL CHECK's null-passes rule), split into the
    * passing and labeled-failing relations. Owned here so the plain and
    * idempotent commit paths can never fork semantics. */
  private def split(df: DataFrame,
                    expectations: Seq[Expectation]): (DataFrame, DataFrame) = {
    require(expectations.nonEmpty, "Expectations: empty constraint set")
    require(expectations.map(_.name).distinct.size == expectations.size,
      "Expectations: duplicate constraint names")
    val violated = sort_array(concat(expectations.map(e =>
      when(e.predicate, array().cast("array<string>"))
        .otherwise(array(lit(e.name)))): _*))
    val labeled = df.withColumn("violated", array_join(violated, ","))
    (labeled.filter(col("violated") === "").drop("violated"),
      labeled.filter(col("violated") =!= ""))
  }

  private def snapshotRows(spark: SparkSession, t: String,
                           v: Option[Long]): Long =
    v.map(vv => TxnLake.snapshotFiles(spark, t, Some(vv))
      .map(_.rows).filterNot(_ < 0).sum).getOrElse(0L)

  private def prevRowsFor(spark: SparkSession, table: String,
                          operation: String): Long =
    if (operation == "append")
      snapshotRows(spark, table, TxnLake.latestVersion(spark, table))
    else 0L

  /** Split `df` on `expectations`, commit passing rows to `table` and
    * failing rows (+ `violated` labels) to the quarantine table; returns
    * both versions and the row counts. `operation` applies to the target
    * table; quarantine always appends (violations accumulate — it is an
    * audit log, not a snapshot). `passed` is derived from the commit's
    * own file row-stats (metadata-only, no extra scan). */
  def commitWithExpectations(spark: SparkSession, df: DataFrame, table: String,
                             operation: String,
                             expectations: Seq[Expectation],
                             bloomCols: Seq[String] = Seq.empty): ExpectationResult = {
    val (good, bad) = split(df, expectations)
    val prevRows = prevRowsFor(spark, table, operation)
    val version = TxnLake.commit(spark, good, table, operation,
      bloomCols = bloomCols)
    val badCount = graft.plans.JobLabel.labeled(spark,
      "expect:quarantine-count") { bad.count() }
    val qv =
      if (badCount == 0) None
      else Some(TxnLake.commit(spark, bad, quarantinePath(table), "append"))
    val passed = snapshotRows(spark, table, Some(version)) - prevRows
    ExpectationResult(version, qv, passed, badCount)
  }

  /** Idempotent [[commitWithExpectations]] — the exactly-once variant an
    * at-least-once scheduler retry needs: returns None when a committed
    * version already records (appId, batchId) for the TARGET table (the
    * whole batch is a replay; nothing is re-committed or re-quarantined).
    * The quarantine append commits FIRST under its own derived txn id
    * (`appId + "#quarantine"`), so a crash between the two commits
    * replays as: quarantine txn found → skipped (its latest committed
    * version is reported, keeping the result's "both versions" promise),
    * target commit absent → performed — both tables land exactly once in
    * every interleaving. */
  def commitOnceWithExpectations(spark: SparkSession, df: DataFrame,
                                 table: String, operation: String,
                                 appId: String, batchId: Long,
                                 expectations: Seq[Expectation],
                                 bloomCols: Seq[String] = Seq.empty): Option[ExpectationResult] = {
    val (good, bad) = split(df, expectations)
    if (TxnLake.lastTxn(spark, table, appId).exists(_ >= batchId)) return None
    val prevRows = prevRowsFor(spark, table, operation)
    val badCount = graft.plans.JobLabel.labeled(spark,
      s"expect:quarantine-count b$batchId") { bad.count() }
    val qv =
      if (badCount == 0) None
      else TxnLake.commitOnce(spark, bad, quarantinePath(table), "append",
        appId + "#quarantine", batchId)
        // crash-replay: the quarantine txn already holds this batch; the
        // rows are THERE, so report the version they live at rather than
        // a None that reads as "nothing quarantined". Resolved from the
        // LOG (the version that committed this exact txn) — the table's
        // latest version may belong to a later batch or another app.
        .orElse(TxnLake.txnVersion(spark, quarantinePath(table),
          appId + "#quarantine", batchId))
    TxnLake.commitOnce(spark, good, table, operation, appId, batchId,
      bloomCols = bloomCols) match {
      case None => None // lost a replay race after the txn pre-check
      case Some(version) =>
        val passed = snapshotRows(spark, table, Some(version)) - prevRows
        Some(ExpectationResult(version, qv, passed, badCount))
    }
  }
}
