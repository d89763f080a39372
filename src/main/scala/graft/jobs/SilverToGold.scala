package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver → Gold: star-schema dimensional modeling
  * (re-expresses `scripts/process_silver_to_gold.py`).
  *
  * Deviations from the reference, per SURVEY §4.3:
  *  - DimDate is built engine-side with sequence+explode instead of a
  *    driver-side Python loop (s2g:61-78) — O(days) inside the engine;
  *  - surrogate keys are `xxhash64(natural key)` instead of
  *    `monotonically_increasing_id` (s2g:86,101,106), which is
  *    nondeterministic across runs/partitionings. xxhash64 is stable,
  *    distributed (no global ordering shuffle), and keys stay opaque —
  *    star-schema semantics unchanged.
  *
  * Scale: each dim is a distinct (one shuffle each, AQE-coalesced); the fact
  * assembly joins dims back by natural key — all broadcastable (dims are
  * ~|distinct locations| ≪ fact) so the fact side never shuffles for joins.
  */
object SilverToGold {

  /** DimDate spanning [min(event ts), max(event ts) + 30 days]
    * (ref: process_silver_to_gold.py:52-78). */
  def dimDate(silver: DataFrame): DataFrame = {
    val fd = col("FullDate")
    silver
      .agg(min(to_date(col("event_timestamp_utc"))).as("mn"),
           date_add(max(to_date(col("event_timestamp_utc"))), 30).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("FullDate"))
      .select(
        date_format(fd, "yyyyMMdd").cast("int").as("DateKey"),
        fd.as("FullDate"),
        year(fd).as("Year"),
        quarter(fd).as("Quarter"),
        month(fd).as("Month"),
        date_format(fd, "MMMM").as("MonthName"),
        dayofmonth(fd).as("DayOfMonth"),
        dayofweek(fd).as("DayOfWeek"),
        date_format(fd, "EEEE").as("DayName"),
        dayofweek(fd).isin(1, 7).as("IsWeekend"))
  }

  /** Distinct-location dimension with stable surrogate key
    * (ref: process_silver_to_gold.py:82-86). */
  def dimLocation(silver: DataFrame): DataFrame =
    silver
      .select(col("latitude"), col("longitude"), col("place"),
        col("extracted_country").as("ExtractedCountry"),
        col("extracted_region_detail").as("ExtractedRegionDetail"),
        col("hemisphere_ns").as("HemisphereNS"),
        col("hemisphere_ew").as("HemisphereEW"))
      .distinct()
      .withColumn("LocationKey",
        xxhash64(col("latitude"), col("longitude"), col("place")))

  /** Static 8-row magnitude-band dimension, including the NULL-band
    * "Unknown" row (ref: process_silver_to_gold.py:90-101). Band bounds
    * match the reference exactly (disjoint .9 uppers); Description text is
    * our own English phrasing (the reference's is Spanish prose — a display
    * attribute no query or relationship touches). */
  def dimMagnitude(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("Micro", Some(-2.0), Some(2.9), "Usually not felt"),
      ("Minor", Some(3.0), Some(3.9), "Often felt, rarely causes damage"),
      ("Light", Some(4.0), Some(4.9), "Noticeable shaking, minor damage"),
      ("Moderate", Some(5.0), Some(5.9), "Can damage poorly built structures"),
      ("Strong", Some(6.0), Some(6.9), "Damage in populated areas"),
      ("Major", Some(7.0), Some(7.9), "Serious widespread damage"),
      ("Great", Some(8.0), Some(10.0), "Severe destruction"),
      ("Unknown", None, None, "Magnitude not determined"))
      .toDF("MagnitudeCategory", "MinMagnitude", "MaxMagnitude", "Description")
      .withColumn("MagnitudeKey", xxhash64(col("MagnitudeCategory")))
  }

  /** Distinct (event_type, magType) dimension (ref: process_silver_to_gold.py:105-106). */
  def dimEventType(silver: DataFrame): DataFrame =
    silver
      .select(col("event_type").as("EventType"), col("magType").as("MagType"))
      .distinct()
      .withColumn("EventTypeKey", xxhash64(col("EventType"), col("MagType")))

  /** Fact assembly: DateKey derivation + 4 dimension joins + final projection
    * (ref: process_silver_to_gold.py:112-139). NULL magType rows drop via
    * plain (non-null-safe) equi-join — intentional reference semantics
    * (SURVEY §7.5.4). */
  def factEarthquakeEvents(silver: DataFrame, dimLoc: DataFrame,
                           dimMag: DataFrame, dimET: DataFrame): DataFrame = {
    val withKeys = silver
      .withColumn("DateKey",
        date_format(col("event_timestamp_utc"), "yyyyMMdd").cast("int"))
    withKeys
      .join(broadcast(dimLoc.select("LocationKey", "latitude", "longitude", "place")),
        Seq("latitude", "longitude", "place"), "inner")
      .join(broadcast(dimMag.select("MagnitudeKey", "MagnitudeCategory")),
        col("magnitude_category") === col("MagnitudeCategory"), "inner")
      // dim-side join cols renamed: Spark's default case-insensitive
      // resolution would make silver `magType` vs dim `MagType` ambiguous
      .join(broadcast(dimET.select(col("EventTypeKey"),
          col("EventType").as("et_key"), col("MagType").as("mt_key"))),
        col("event_type") === col("et_key") && col("magType") === col("mt_key"),
        "inner")
      .select(
        col("event_id").as("EventID"),
        col("DateKey"), col("LocationKey"), col("MagnitudeKey"), col("EventTypeKey"),
        col("event_timestamp_utc").as("EventTimestamp"),
        col("magnitude").as("Magnitude"),
        col("depth_km").as("DepthKm"),
        col("significance").as("Significance"),
        col("felt_reports").as("FeltReports"),
        col("nst_stations").as("NstStations"),
        col("rms_travel_time").as("RmsTravelTime"),
        col("gap_azimuthal").as("GapAzimuthal"),
        col("tsunami_warning").as("TsunamiWarning"),
        col("latitude"), col("longitude"),
        current_timestamp().as("GoldProcessingTimestamp"))
      .dropDuplicates(Seq("EventID"))
  }

  /** All six gold tables from a silver DataFrame. */
  def buildAll(spark: SparkSession, silver: DataFrame): Map[String, DataFrame] = {
    val dDate = dimDate(silver)
    val dLoc = dimLocation(silver)
    val dMag = dimMagnitude(spark)
    val dET = dimEventType(silver)
    val fact = factEarthquakeEvents(silver, dLoc, dMag, dET)
    Map(
      "dim_date" -> dDate,
      "dim_location" -> dLoc,
      "dim_magnitude" -> dMag,
      "dim_event_type" -> dET,
      "fact_earthquake_events" -> fact)
  }

  /** End-to-end job: silver scan → star schema → warehouse sink
    * (overwrite = BigQuery full-table-replace semantics, SURVEY §2.1 S7). */
  def run(spark: SparkSession, silverPath: String, goldPath: String,
          lake: graft.sources.LakeFormat = graft.sources.ParquetLake): Map[String, DataFrame] = {
    val warehouse = new graft.sources.ParquetWarehouse(goldPath)
    val silver = lake.read(spark, silverPath)
    if (silver.isEmpty) return Map.empty
    // cache: every table write re-executes the silver lineage otherwise
    // (the reference re-runs it 5×, SURVEY §4.3.1)
    silver.cache()
    val tables = buildAll(spark, silver)
    tables.foreach { case (name, df) => warehouse.writeTable(df, name) }
    silver.unpersist()
    tables.map { case (name, _) => name -> warehouse.readTable(spark, name) }
  }
}
