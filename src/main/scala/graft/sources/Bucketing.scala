package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins: writing both sides of a
  * hot join bucketed by the join key lets Spark plan a SortMergeJoin with
  * NO Exchange on either side — the shuffle is paid once at write time and
  * amortized over every subsequent join/aggregation on that key.
  *
  * This is the biggest single lever for a recurring 100 TB fact⋈fact join:
  * at cluster scale the avoided exchange is the dominant cost. Bucket
  * counts should divide evenly into executor cores (here 8 for local[4]
  * tests; hundreds on a real cluster).
  */
object Bucketing {

  /** Write a DataFrame as a bucketed (and sorted-within-buckets) managed
    * table — sorting makes the downstream SortMergeJoin's sort a no-op. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int = 8): Unit = {
    // simple unqualified names only — qualified names nest under a db dir
    // and would defeat the stale-location cleanup below
    require(!table.contains("."), s"use an unqualified table name, got $table")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous session's managed location survives the in-memory catalog;
    // clear it or CREATE TABLE AS refuses with LOCATION_ALREADY_EXISTS.
    // Spark lowercases managed-table directory names.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val whPath = Option(new java.net.URI(wh).getPath).filter(_.nonEmpty).getOrElse(wh)
    val loc = new java.io.File(s"$whPath/${table.toLowerCase}")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
      require(!loc.exists(),
        s"could not clear stale managed-table location $loc — delete it manually")
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — plans with zero
    * exchanges when both sides share the bucket count. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
