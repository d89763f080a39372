package graft.ingest

import java.nio.file.{Files, Paths}

/** Ingestion-side stand-ins for the reference's Cloud Function
  * (cloud_function/main.py): fetch parameters + bronze blob writer.
  *
  * The HTTP fetch itself is a process boundary, not an engine operator
  * (SURVEY §2.1 S1) — in this zero-egress environment we model it as a
  * deterministic fixture writer with the exact document shape the real
  * endpoint returns (FIXTURES.md §A).
  */
object UsgsGeoJson {

  /** The reference's fetch envelope (cf:59-80): trailing 365 days,
    * minmagnitude 2.5, limit 20000, format geojson. */
  final case class FetchParams(
      windowDays: Int = 365,
      minMagnitude: Double = 2.5,
      limit: Int = 20000,
      format: String = "geojson")

  private def feature(id: String, mag: java.lang.Double, place: String,
                      time: java.lang.Long, updated: java.lang.Long,
                      tsunami: Int, magType: String, typ: String,
                      lon: Double, lat: Double, depth: Double,
                      felt: java.lang.Integer = null,
                      nst: java.lang.Integer = null,
                      sig: java.lang.Integer = 100): String = {
    def jnum(x: Any): String = if (x == null) "null" else x.toString
    def jstr(x: String): String = if (x == null) "null" else "\"" + x + "\""
    s"""{"type":"Feature","id":${jstr(id)},"properties":{"mag":${jnum(mag)},"place":${jstr(place)},"time":${jnum(time)},"updated":${jnum(updated)},"url":"https://example.org/eventpage/$id","felt":${jnum(felt)},"cdi":3.4,"mmi":4.0,"alert":"green","status":"reviewed","tsunami":$tsunami,"sig":${jnum(sig)},"net":"us","code":"$id","nst":${jnum(nst)},"dmin":1.1,"rms":0.7,"gap":40.0,"magType":${jstr(magType)},"type":${jstr(typ)},"title":${jstr(if (mag == null) place else s"M $mag - $place")}},"geometry":{"type":"Point","coordinates":[$lon,$lat,$depth]}}"""
  }

  /** Deterministic synthetic FeatureCollection covering every silver code
    * path (FIXTURES.md §A's case table): magnitude bands, depth bands, all
    * four hemisphere quadrants, dup ids (latest-wins + tied), comma/no-comma
    * places, each validation-drop branch, null magType, non-earthquake type,
    * events spanning two years. */
  def fixtureDocument(): String = {
    val jan2024 = 1704067200000L // 2024-01-01T00:00:00Z
    val jul2023 = 1688169600000L // 2023-07-01T00:00:00Z
    val day = 86400000L
    val fs = Seq(
      // magnitude bands (valid rows), 4 quadrants, 3 depth bands
      feature("ev01", 2.6, "10 km N of Plateau, Alaska", jan2024, jan2024 + 1000, 0, "ml", "earthquake", -150.0, 61.0, 10.0, felt = 3, nst = 20),
      feature("ev02", 3.5, "22 km S of Ridge, Chile", jan2024 + day, jan2024 + day + 1000, 0, "md", "earthquake", -70.0, -30.0, 80.0, felt = 5, nst = 30),
      feature("ev03", 4.5, "5 km E of Trench, Japan", jan2024 + 2 * day, jan2024 + 2 * day + 1000, 0, "mb", "earthquake", 142.0, 38.0, 350.0, felt = 8, nst = 40),
      feature("ev04", 5.5, "Fiji region", jan2024 + 3 * day, jan2024 + 3 * day + 1000, 0, "mww", "earthquake", 178.0, -17.0, 60.0, felt = 11, nst = 55),
      feature("ev05", 6.5, "42 km SW of Tonga, Tonga", jul2023, jul2023 + 1000, 1, "mww", "earthquake", -175.2, -21.2, 10.5, felt = 40, nst = 120),
      feature("ev06", 7.5, "Off the coast, Peru", jul2023 + day, jul2023 + day + 1000, 1, "mww", "earthquake", -77.0, -12.0, 33.0, felt = 90, nst = 200),
      feature("ev07", 8.5, "Sea of Okhotsk, Russia", jul2023 + 2 * day, jul2023 + 2 * day + 1000, 1, "mww", "earthquake", 153.0, 54.0, 600.0, felt = 150, nst = 300),
      // duplicate id: two updated values — latest (higher mag) must win
      feature("ev08", 4.0, "near  Coast, Mexico ", jan2024 + 4 * day, jan2024 + 4 * day + 1000, 0, "mb", "earthquake", -100.0, 17.0, 25.0, felt = 2, nst = 15),
      feature("ev08", 4.2, "near  Coast, Mexico ", jan2024 + 4 * day, jan2024 + 4 * day + 5000, 0, "mb", "earthquake", -100.0, 17.0, 25.0, felt = 2, nst = 15),
      // duplicate id with TIED updated — secondary key (event ts) decides
      feature("ev09", 3.1, "Plateau region", jan2024 + 5 * day, jan2024 + 5 * day + 1000, 0, "ml", "earthquake", 10.0, 45.0, 12.0),
      feature("ev09", 3.1, "Plateau region", jan2024 + 5 * day + 500, jan2024 + 5 * day + 1000, 0, "ml", "earthquake", 10.0, 45.0, 12.0),
      // null magType → dropped by gold J4 inner join (not by silver)
      feature("ev10", 5.1, "Kermadec Islands, New Zealand", jan2024 + 6 * day, jan2024 + 6 * day + 1000, 0, null, "earthquake", -178.0, -30.0, 45.0, felt = 7, nst = 60),
      // non-earthquake type → excluded by the ML filter only
      feature("ev11", 2.9, "Quarry site", jan2024 + 7 * day, jan2024 + 7 * day + 1000, 0, "ml", "quarry blast", -105.0, 39.0, 0.5, felt = 1, nst = 5),
      // validation-drop branches: null mag, mag>10, lat>90, lon<-180, depth<0, depth>1000, null time, null id
      feature("bad1", null, "No magnitude, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", 0.0, 0.0, 1.0),
      feature("bad2", 10.5, "Impossible, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", 0.0, 0.0, 1.0),
      feature("bad3", 4.0, "Bad lat, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", 0.0, 95.0, 1.0),
      feature("bad4", 4.0, "Bad lon, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", -190.0, 0.0, 1.0),
      feature("bad5", 4.0, "Bad depth, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", 0.0, 0.0, -1.0),
      feature("bad6", 4.0, "Deep depth, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", 0.0, 0.0, 1200.0),
      feature("bad7", 4.0, "No time, Nowhere", null, jan2024 + 1, 0, "ml", "earthquake", 0.0, 0.0, 1.0),
      feature(null, 4.0, "No id, Nowhere", jan2024, jan2024 + 1, 0, "ml", "earthquake", 0.0, 0.0, 1.0))
    s"""{"type":"FeatureCollection","metadata":{"generated":${jan2024 + 30 * day},"count":${fs.size}},"features":[${fs.mkString(",")}]}"""
  }

  /** Write the bronze blob exactly as the reference does — one JSON document
    * serialized on a single line (cf:83-89's json.dumps → GCS upload,
    * URI scheme swapped for the local lake dir). */
  def writeBronze(path: String, document: String = fixtureDocument()): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, document)
  }
}
