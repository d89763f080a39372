package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst keeps full pushdown
  * (PushedFilters / ReadSchema pruning) — never materialize or cache here.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The `events.ts` encodings [[events]] can normalize — the SINGLE
    * source of truth shared with [[TableContracts]], so the next encoding
    * flip is extended in one place and the contract probe can never drift
    * from the reader (a contract update without a reader update, or vice
    * versa, previously required editing two files in lockstep). */
  val EventsTsAcceptedTypes: Set[org.apache.spark.sql.types.DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  /** `events` normalized to a fixed contract regardless of how the driver
    * encoded `ts` in parquet — downstream code (queries, streaming landing,
    * lake writers) relies on exactly two columns:
    *
    *   - `ts`         : LongType epoch-NANOS (integer arithmetic — interval
    *                    math like `ts + hourNanos`, `ts DIV week` stays
    *                    exact; a double divide would lose precision at
    *                    ~1.7e18 > 2^53)
    *   - `event_time` : TimestampType (micros), for time functions,
    *                    windows, and watermarks
    *
    * The testdata generator has shipped `ts` as both `timestamp[ns]` (read
    * as LongType under `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[graft.GraftSession]]) and `timestamp[us]` (read as TimestampNTZType —
    * pandas writes NTZ; cast to TimestampType is wall-clock-preserving
    * under the UTC session zone, and `unix_micros` requires TimestampType).
    * Branch on the resolved type; anything else fails loudly HERE rather
    * than as scattered analysis errors in every consumer.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    // column drift (rename/drop), not just type drift, must fail with the
    // same guided message — raw.schema("ts") alone would throw a bare
    // "Field ts does not exist" with no pointer to this seam
    if (!raw.schema.fieldNames.contains("ts"))
      throw new IllegalStateException(
        s"events: column `ts` is missing (found ${raw.schema.fieldNames.mkString(", ")}) — " +
          "the testdata generator renamed or dropped it; extend Tables.events, the single " +
          "normalization point, rather than patching consumers")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType =>
        raw
          .withColumn("event_time", col("ts").cast(TimestampType))
          .withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts: expected int64-nanos (LongType) or a timestamp type, got $other — " +
            "the testdata encoding changed again; extend Tables.events, the single " +
            "normalization point, rather than patching consumers")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
