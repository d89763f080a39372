package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage abstractions decoupling the pipeline from concrete formats
  * (SURVEY §7.3): the reference writes Delta on GCS and BigQuery tables;
  * this environment has neither connector, so the default implementations
  * are partitioned parquet — chosen because parquet preserves every
  * observable semantic the reference exercises (overwrite snapshots,
  * partition pruning on year/month, full-table-replace warehouse loads)
  * minus Delta's ACID log, which nothing in the reference reads.
  *
  * Swapping in Delta/BigQuery on a real cluster is a one-line format
  * change behind these traits; job code does not change.
  */
trait LakeFormat {
  def write(df: DataFrame, path: String, partitionBy: Seq[String]): Unit
  def read(spark: SparkSession, path: String): DataFrame
}

/** Warehouse table sink with the reference's overwrite (full replace)
  * semantics (ref: process_silver_to_gold.py:143-150). */
trait WarehouseSink {
  def writeTable(df: DataFrame, table: String): Unit
  def readTable(spark: SparkSession, table: String): DataFrame
}

/** Parquet lake: overwrite snapshots partitioned for pruning
  * (ref: process_bronze_to_silver.py:146's partitionBy(year, month)). */
object ParquetLake extends LakeFormat {
  def write(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}

/** Local warehouse: one parquet directory per table under a root. */
final class ParquetWarehouse(root: String) extends WarehouseSink {
  def writeTable(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$root/$table")
  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$root/$table")
}
