package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed (case-class) mirrors of the six entities — `Dataset[T]` with
  * compile-time field checks for code paths where the schema is static
  * (SURVEY §1.3: "DataFrame for the generic query layer; Dataset[T] case
  * classes for the six entities"). Nullable columns are Options; tri-state
  * `status` is `Option[Boolean]` (None = pending). */
object TypedEntities {

  final case class GooglePlaceUrl(
      id: String, url: String, location: Option[String],
      status: Option[Boolean], notes: Option[String],
      createdAt: Option[Timestamp], updatedAt: Option[Timestamp])

  final case class PlaceEntry(
      id: String, name: Option[String], url: String,
      address: Option[String], telephone: Option[String],
      location: Option[String], status: Option[Boolean],
      notes: Option[String],
      createdAt: Option[Timestamp], updatedAt: Option[Timestamp])

  final case class Company(
      id: String, name: String, websiteUrl: String,
      emailAddress: Option[String], phoneNumber: Option[String],
      address: Option[String], industry: Option[String],
      location: Option[String],
      createdAt: Option[Timestamp], updatedAt: Option[Timestamp])

  final case class FirmService(
      id: String, name: String,
      createdAt: Option[Timestamp], updatedAt: Option[Timestamp])

  final case class CrmSyncEvent(
      id: String, companyId: String, status: Option[Boolean],
      notes: Option[String],
      createdAt: Option[Timestamp], updatedAt: Option[Timestamp])

  final case class Notification(
      id: String, message: String, metadata: Option[String],
      serviceName: String,
      createdAt: Option[Timestamp], updatedAt: Option[Timestamp])

  /** Typed views over the store snapshots. */
  implicit class TypedStore(private val st: PipelineStore) {
    def urlsDs(implicit s: SparkSession): Dataset[GooglePlaceUrl] = {
      import s.implicits._; st.urls.snapshot().as[GooglePlaceUrl]
    }
    def placesDs(implicit s: SparkSession): Dataset[PlaceEntry] = {
      import s.implicits._; st.places.snapshot().as[PlaceEntry]
    }
    def companiesDs(implicit s: SparkSession): Dataset[Company] = {
      import s.implicits._; st.companies.snapshot().as[Company]
    }
    def crmEventsDs(implicit s: SparkSession): Dataset[CrmSyncEvent] = {
      import s.implicits._; st.crmEvents.snapshot().as[CrmSyncEvent]
    }
    def notificationsDs(implicit s: SparkSession): Dataset[Notification] = {
      import s.implicits._; st.notifications.snapshot().as[Notification]
    }
  }
}
