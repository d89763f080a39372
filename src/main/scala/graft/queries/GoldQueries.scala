package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's de-facto query API: the 10 Power BI visuals over gold
  * (SURVEY.md §2.9), each a parameterized DataFrame transformation that
  * composes the three slicer predicates through the relationship graph
  * (relationships.tmdl — DateKey, LocationKey, MagnitudeKey, EventTypeKey).
  *
  * Slicers push as plain filters before aggregation, so Catalyst folds them
  * into the fact scan (partition/predicate pushdown at scale).
  */
object GoldQueries {

  /** Composable slicer state (date range over dim_date.FullDate, tsunami
    * flag, magnitude category — the three slicer visuals). */
  final case class SlicerState(
      dateFrom: Option[String] = None,
      dateTo: Option[String] = None,
      tsunamiWarning: Option[Boolean] = None,
      magnitudeCategories: Option[Seq[String]] = None)

  object SlicerState { val none: SlicerState = SlicerState() }

  /** Fact filtered through the slicer relationship graph. */
  def slicedFact(fact: DataFrame, dimDate: DataFrame, dimMag: DataFrame,
                 s: SlicerState): DataFrame = {
    var f = fact
    if (s.dateFrom.isDefined || s.dateTo.isDefined) {
      var d = dimDate
      s.dateFrom.foreach(x => d = d.filter(col("FullDate") >= lit(x)))
      s.dateTo.foreach(x => d = d.filter(col("FullDate") <= lit(x)))
      f = f.join(broadcast(d.select("DateKey")), Seq("DateKey"), "left_semi")
    }
    s.tsunamiWarning.foreach(x => f = f.filter(col("TsunamiWarning") === lit(x)))
    s.magnitudeCategories.foreach { cats =>
      val d = dimMag.filter(col("MagnitudeCategory").isin(cats: _*))
      f = f.join(broadcast(d.select("MagnitudeKey")), Seq("MagnitudeKey"), "left_semi")
    }
    f
  }

  /** Card: total events — Count(EventID), Function 2. */
  def totalEvents(fact: DataFrame): DataFrame =
    fact.agg(count(col("EventID")).as("TotalEvents"))

  /** Card: average magnitude — Avg, Function 1. */
  def avgMagnitude(fact: DataFrame): DataFrame =
    fact.agg(avg(col("Magnitude")).as("AvgMagnitude"))

  /** Card: max magnitude — Max, Function 4. */
  def maxMagnitude(fact: DataFrame): DataFrame =
    fact.agg(max(col("Magnitude")).as("MaxMagnitude"))

  /** Card: tsunami warnings issued — CountNonNull(TsunamiWarning) with an
    * `IN (true)` categorical filter, Function 5. */
  def tsunamiWarningsIssued(fact: DataFrame): DataFrame =
    fact.filter(col("TsunamiWarning") === true)
      .agg(count(col("TsunamiWarning")).as("WarningsIssued"))

  /** Line chart: events over the date drill hierarchy. Levels:
    * "Year" | "Quarter" | "Month" | "Day" (cumulative drill columns). */
  def eventsByDateLevel(fact: DataFrame, dimDate: DataFrame, level: String): DataFrame = {
    val drill: Seq[String] = level match {
      case "Year" => Seq("Year")
      case "Quarter" => Seq("Year", "Quarter")
      case "Month" => Seq("Year", "Quarter", "Month")
      case _ => Seq("Year", "Quarter", "Month", "DayOfMonth")
    }
    fact.join(broadcast(dimDate), Seq("DateKey"), "inner")
      .groupBy(drill.map(col): _*)
      .agg(count(col("EventID")).as("EventCount"))
      .orderBy(drill.map(col): _*)
  }

  /** Column chart: events by country, count desc (tie-broken by name for
    * determinism). */
  def eventsByCountry(fact: DataFrame, dimLocation: DataFrame): DataFrame =
    fact.join(broadcast(dimLocation), Seq("LocationKey"), "inner")
      .groupBy(col("ExtractedCountry"))
      .agg(count(col("EventID")).as("EventCount"))
      .orderBy(col("EventCount").desc, col("ExtractedCountry"))

  /** Map: sum(Magnitude) bubble per (lat, lon, MagnitudeCategory), Function 0. */
  def magnitudeMap(fact: DataFrame, dimLocation: DataFrame, dimMag: DataFrame): DataFrame =
    fact
      .join(broadcast(dimLocation.select("LocationKey", "latitude", "longitude")
        .withColumnRenamed("latitude", "Lat").withColumnRenamed("longitude", "Lon")),
        Seq("LocationKey"), "inner")
      .join(broadcast(dimMag.select("MagnitudeKey", "MagnitudeCategory")),
        Seq("MagnitudeKey"), "inner")
      .groupBy(col("Lat"), col("Lon"), col("MagnitudeCategory"))
      .agg(sum(col("Magnitude")).as("SumMagnitude"))

  /** Slicer domains: distinct values of the slicer columns. */
  def sliceValues(dimDate: DataFrame): DataFrame =
    dimDate.select(col("FullDate")).distinct().orderBy(col("FullDate"))

  def tsunamiSliceValues(fact: DataFrame): DataFrame =
    fact.select(col("TsunamiWarning")).distinct().orderBy(col("TsunamiWarning"))

  def magnitudeSliceValues(dimMag: DataFrame): DataFrame =
    dimMag.select(col("MagnitudeCategory")).distinct().orderBy(col("MagnitudeCategory"))
}
