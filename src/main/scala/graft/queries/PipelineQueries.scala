package graft.queries

import org.apache.spark.sql.functions._

/** The earthquake pipeline itself — bronze GeoJSON → silver → gold star
  * schema — registered as a driver-gated query, so the reference-parity
  * path (jobs/BronzeToSilver.scala + jobs/SilverToGold.scala) is
  * hash-checked against the DuckDB oracle every round, not just
  * scalatest-gated.
  *
  * The Spark side runs the REAL jobs end to end over the deterministic
  * USGS fixture (ingest/UsgsGeoJson.scala): write the bronze blob, run
  * BronzeToSilver (flatten ×21, cast, validate, latest-wins dedup,
  * enrich), run SilverToGold (4 dims + fact with broadcast key joins),
  * then read the fact back from the warehouse and join every surrogate
  * key to its dimension's natural attributes. Audit timestamps are
  * excluded (non-deterministic); the xxhash64 surrogate keys are not
  * emitted raw (DuckDB cannot reproduce Spark's xxhash64) but are GATED
  * by the joins — a wrong or unstable key loses or duplicates fact rows
  * and fails the hash compare.
  *
  * The oracle re-implements the transform semantics independently in SQL
  * over the same fixture features (inlined as VALUES — the INPUT data, not
  * the expected output): validation bounds, latest-update-wins dedup with
  * the deterministic event-time tie-break, magnitude/depth banding,
  * hemispheres, region extraction, the null-magType inner-join drop, and
  * the DateKey/weekend derivations.
  */
object PipelineQueries {

  /** Fixture features as (id, mag, place, t_ms, upd_ms, tsunami, magtype,
    * etype, lon, lat, depth, felt, nst, sig) VALUES — byte-for-byte the
    * payload of UsgsGeoJson.fixtureDocument(). */
  private val rawValues =
    """raw(id, mag, place, t_ms, upd_ms, tsunami, magtype, etype,
      |    lon, lat, depth, felt, nst, sig) AS (VALUES
      |  ('ev01', 2.6, '10 km N of Plateau, Alaska', 1704067200000, 1704067201000, 0, 'ml', 'earthquake', -150.0, 61.0, 10.0, 3, 20, 100),
      |  ('ev02', 3.5, '22 km S of Ridge, Chile', 1704153600000, 1704153601000, 0, 'md', 'earthquake', -70.0, -30.0, 80.0, 5, 30, 100),
      |  ('ev03', 4.5, '5 km E of Trench, Japan', 1704240000000, 1704240001000, 0, 'mb', 'earthquake', 142.0, 38.0, 350.0, 8, 40, 100),
      |  ('ev04', 5.5, 'Fiji region', 1704326400000, 1704326401000, 0, 'mww', 'earthquake', 178.0, -17.0, 60.0, 11, 55, 100),
      |  ('ev05', 6.5, '42 km SW of Tonga, Tonga', 1688169600000, 1688169601000, 1, 'mww', 'earthquake', -175.2, -21.2, 10.5, 40, 120, 100),
      |  ('ev06', 7.5, 'Off the coast, Peru', 1688256000000, 1688256001000, 1, 'mww', 'earthquake', -77.0, -12.0, 33.0, 90, 200, 100),
      |  ('ev07', 8.5, 'Sea of Okhotsk, Russia', 1688342400000, 1688342401000, 1, 'mww', 'earthquake', 153.0, 54.0, 600.0, 150, 300, 100),
      |  ('ev08', 4.0, 'near  Coast, Mexico ', 1704412800000, 1704412801000, 0, 'mb', 'earthquake', -100.0, 17.0, 25.0, 2, 15, 100),
      |  ('ev08', 4.2, 'near  Coast, Mexico ', 1704412800000, 1704412805000, 0, 'mb', 'earthquake', -100.0, 17.0, 25.0, 2, 15, 100),
      |  ('ev09', 3.1, 'Plateau region', 1704499200000, 1704499201000, 0, 'ml', 'earthquake', 10.0, 45.0, 12.0, NULL, NULL, 100),
      |  ('ev09', 3.1, 'Plateau region', 1704499200500, 1704499201000, 0, 'ml', 'earthquake', 10.0, 45.0, 12.0, NULL, NULL, 100),
      |  ('ev10', 5.1, 'Kermadec Islands, New Zealand', 1704585600000, 1704585601000, 0, NULL, 'earthquake', -178.0, -30.0, 45.0, 7, 60, 100),
      |  ('ev11', 2.9, 'Quarry site', 1704672000000, 1704672001000, 0, 'ml', 'quarry blast', -105.0, 39.0, 0.5, 1, 5, 100),
      |  ('bad1', NULL, 'No magnitude, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', 0.0, 0.0, 1.0, NULL, NULL, 100),
      |  ('bad2', 10.5, 'Impossible, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', 0.0, 0.0, 1.0, NULL, NULL, 100),
      |  ('bad3', 4.0, 'Bad lat, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', 0.0, 95.0, 1.0, NULL, NULL, 100),
      |  ('bad4', 4.0, 'Bad lon, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', -190.0, 0.0, 1.0, NULL, NULL, 100),
      |  ('bad5', 4.0, 'Bad depth, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', 0.0, 0.0, -1.0, NULL, NULL, 100),
      |  ('bad6', 4.0, 'Deep depth, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', 0.0, 0.0, 1200.0, NULL, NULL, 100),
      |  ('bad7', 4.0, 'No time, Nowhere', NULL, 1704067200001, 0, 'ml', 'earthquake', 0.0, 0.0, 1.0, NULL, NULL, 100),
      |  (NULL, 4.0, 'No id, Nowhere', 1704067200000, 1704067200001, 0, 'ml', 'earthquake', 0.0, 0.0, 1.0, NULL, NULL, 100))""".stripMargin

  val quakePipeline = OracleQuery(
    "q48_earthquake_pipeline",
    s"""WITH $rawValues,
       |valid AS (
       |  SELECT * FROM raw
       |  WHERE id IS NOT NULL AND t_ms IS NOT NULL
       |    AND mag IS NOT NULL AND mag BETWEEN -2.0 AND 10.0
       |    AND lat IS NOT NULL AND lat BETWEEN -90.0 AND 90.0
       |    AND lon IS NOT NULL AND lon BETWEEN -180.0 AND 180.0
       |    AND depth IS NOT NULL AND depth >= 0.0 AND depth < 1000.0),
       |dedup AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id
       |        ORDER BY upd_ms DESC, t_ms DESC) AS rn
       |    FROM valid) WHERE rn = 1),
       |fact AS (SELECT * FROM dedup WHERE magtype IS NOT NULL),
       |enr AS (
       |  SELECT *,
       |    epoch_ms(t_ms) AS ets,
       |    trim(regexp_extract(place, ',\\s*(.*)$$', 1)) AS region
       |  FROM fact)
       |SELECT id AS EventID,
       |  CAST(strftime(ets, '%Y%m%d') AS INTEGER) AS DateKey,
       |  CAST(ets AS DATE) AS FullDate,
       |  dayofweek(CAST(ets AS DATE)) IN (0, 6) AS IsWeekend,
       |  CAST(t_ms AS BIGINT) AS event_time_ms,
       |  CAST(mag AS DOUBLE) AS Magnitude,
       |  CAST(depth AS DOUBLE) AS DepthKm,
       |  CAST(sig AS INTEGER) AS Significance,
       |  CAST(felt AS INTEGER) AS FeltReports,
       |  CAST(nst AS INTEGER) AS NstStations,
       |  CAST(0.7 AS DOUBLE) AS RmsTravelTime,
       |  CAST(40.0 AS DOUBLE) AS GapAzimuthal,
       |  tsunami = 1 AS TsunamiWarning,
       |  CAST(lat AS DOUBLE) AS latitude,
       |  CAST(lon AS DOUBLE) AS longitude,
       |  place,
       |  CASE WHEN region <> '' THEN region ELSE trim(place) END AS ExtractedCountry,
       |  CASE WHEN lat >= 0 THEN 'Northern' ELSE 'Southern' END AS HemisphereNS,
       |  CASE WHEN lon >= 0 THEN 'Eastern' ELSE 'Western' END AS HemisphereEW,
       |  CASE WHEN mag < 3.0 THEN 'Micro' WHEN mag < 4.0 THEN 'Minor'
       |       WHEN mag < 5.0 THEN 'Light' WHEN mag < 6.0 THEN 'Moderate'
       |       WHEN mag < 7.0 THEN 'Strong' WHEN mag < 8.0 THEN 'Major'
       |       ELSE 'Great' END AS MagnitudeCategory,
       |  etype AS EventType,
       |  magtype AS MagType
       |FROM enr ORDER BY EventID""".stripMargin) { (s, _) =>
    // per-process scratch: bounded /tmp, wiped per invocation, removed at exit
    val base = Scratch.dir("quake_pipeline")
    val bronze = s"$base/bronze/usgs_all_month.geojson"
    graft.ingest.UsgsGeoJson.writeBronze(bronze)
    graft.jobs.BronzeToSilver.run(s, bronze, s"$base/silver")
    val gold = graft.jobs.SilverToGold.run(s, s"$base/silver", s"$base/gold")
    gold("fact_earthquake_events")
      .join(gold("dim_location")
        .select("LocationKey", "place", "ExtractedCountry", "HemisphereNS", "HemisphereEW"),
        Seq("LocationKey"))
      .join(gold("dim_magnitude").select("MagnitudeKey", "MagnitudeCategory"),
        Seq("MagnitudeKey"))
      .join(gold("dim_event_type").select("EventTypeKey", "EventType", "MagType"),
        Seq("EventTypeKey"))
      .join(gold("dim_date").select("DateKey", "FullDate", "IsWeekend"),
        Seq("DateKey"))
      .select(col("EventID"), col("DateKey"), col("FullDate"), col("IsWeekend"),
        unix_millis(col("EventTimestamp")).as("event_time_ms"),
        col("Magnitude"), col("DepthKm"), col("Significance"),
        col("FeltReports"), col("NstStations"),
        col("RmsTravelTime"), col("GapAzimuthal"), col("TsunamiWarning"),
        col("latitude"), col("longitude"), col("place"),
        col("ExtractedCountry"), col("HemisphereNS"), col("HemisphereEW"),
        col("MagnitudeCategory"), col("EventType"), col("MagType"))
      .orderBy("EventID")
  }

  val all: Seq[OracleQuery] = Seq(quakePipeline)
}
