package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers are plain parquet scans so Catalyst keeps full pushdown
  * (PushedFilters / ReadSchema pruning) — never materialize or cache here.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` carries a nanosecond parquet timestamp which Spark reads as
    * a long (requires `spark.sql.legacy.parquet.nanosAsLong=true`, set by
    * [[graft.GraftSession]]). Normalize to a proper micros timestamp with
    * *integer* division — `ts / 1000` as a double would lose precision at
    * epoch-nanos magnitude (~1.7e18 > 2^53).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))

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
