package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/** Typed view of the 32-column silver contract (SURVEY §1.3/§1.5) — the
  * `Dataset[T]` surface for callers that want compile-time field checks;
  * the DataFrame remains the primary dynamic-schema abstraction.
  * Optionals mark the fields the validation filter does NOT guarantee. */
final case class SilverEvent(
    event_id: String,
    event_timestamp_utc: Timestamp,
    updated_timestamp_utc: Option[Timestamp],
    magnitude: Double,
    depth_km: Double,
    latitude: Double,
    longitude: Double,
    significance: Option[Int],
    felt_reports: Option[Int],
    nst_stations: Option[Int],
    rms_travel_time: Option[Double],
    gap_azimuthal: Option[Double],
    tsunami_warning: Option[Boolean],
    event_type: Option[String],
    magType: Option[String],
    alert: Option[String],
    status: Option[String],
    url: Option[String],
    title: Option[String],
    place: Option[String],
    magnitude_category: String,
    depth_category: String,
    hemisphere_ns: String,
    hemisphere_ew: String,
    year: Int,
    month: Int,
    day: Int,
    hour: Int,
    day_of_week: Int,
    extracted_region_detail: Option[String],
    extracted_country: Option[String],
    silver_processing_timestamp_utc: Timestamp)

object SilverEvent {
  implicit val encoder: Encoder[SilverEvent] = Encoders.product[SilverEvent]

  /** Typed view of a silver DataFrame (column order independent). */
  def typed(silver: DataFrame): Dataset[SilverEvent] = silver.as[SilverEvent]
}
