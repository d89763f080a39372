package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the earthquake pipeline's layers.
  *
  * Bronze mirrors the USGS GeoJSON FeatureCollection the reference ingests
  * (ref: cloud_function/main.py:64-70, process_bronze_to_silver.py:46-74).
  * Schema inference remains supported (`spark.read.json` without a schema),
  * but the explicit StructType is the test-deterministic contract
  * (SURVEY.md §1.2).
  */
object EarthquakeSchemas {

  /** One GeoJSON feature's `properties` struct — the 21 fields the silver
    * job projects (ref: process_bronze_to_silver.py:48-70). */
  val propertiesSchema: StructType = StructType(Seq(
    StructField("mag", DoubleType),
    StructField("place", StringType),
    StructField("time", LongType),
    StructField("updated", LongType),
    StructField("url", StringType),
    StructField("felt", LongType),
    StructField("cdi", DoubleType),
    StructField("mmi", DoubleType),
    StructField("alert", StringType),
    StructField("status", StringType),
    StructField("tsunami", LongType),
    StructField("sig", LongType),
    StructField("net", StringType),
    StructField("code", StringType),
    StructField("nst", LongType),
    StructField("dmin", DoubleType),
    StructField("rms", DoubleType),
    StructField("gap", DoubleType),
    StructField("magType", StringType),
    StructField("type", StringType),
    StructField("title", StringType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("id", StringType),
    StructField("properties", propertiesSchema),
    StructField("geometry", StructType(Seq(
      StructField("type", StringType),
      // [longitude, latitude, depth_km] (ref: process_bronze_to_silver.py:71-73)
      StructField("coordinates", ArrayType(DoubleType)))))))

  /** Top-level FeatureCollection document (one bronze blob = one row). */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("metadata", StructType(Seq(
      StructField("generated", LongType),
      StructField("count", LongType)))),
    StructField("features", ArrayType(featureSchema))))

  /** The 32 silver columns in contract order (SURVEY.md §1.3). */
  val silverColumns: Seq[String] = Seq(
    "event_id", "event_timestamp_utc", "updated_timestamp_utc",
    "magnitude", "depth_km", "latitude", "longitude",
    "significance", "felt_reports", "nst_stations",
    "rms_travel_time", "gap_azimuthal",
    "tsunami_warning", "event_type", "magType", "alert", "status",
    "url", "title", "place",
    "magnitude_category", "depth_category", "hemisphere_ns", "hemisphere_ew",
    "year", "month", "day", "hour", "day_of_week",
    "extracted_region_detail", "extracted_country",
    "silver_processing_timestamp_utc")
}
