package graft.pipeline

import graft.store.{Catalog, GraftTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Schemas for the six reference entities (`src/db/schema.prisma:16-99`,
  * FIXTURES.md §A) as explicit StructTypes — the schema system is
  * fixed/declared, never inferred (SURVEY §1.3). */
object Entities {

  val googlePlaceUrlToScrape: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("location", StringType, nullable = true),
    StructField("status", BooleanType, nullable = true), // tri-state
    StructField("notes", StringType, nullable = true),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  val placeEntry: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("url", StringType, nullable = false),
    StructField("address", StringType, nullable = true),
    StructField("telephone", StringType, nullable = true),
    StructField("location", StringType, nullable = true),
    StructField("status", BooleanType, nullable = true),
    StructField("notes", StringType, nullable = true),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  val company: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("websiteUrl", StringType, nullable = false),
    StructField("emailAddress", StringType, nullable = true),
    StructField("phoneNumber", StringType, nullable = true),
    StructField("address", StringType, nullable = true),
    StructField("industry", StringType, nullable = true),
    StructField("location", StringType, nullable = true),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  val firmService: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  /** Implicit M-N join table `_CompanyToFirmService(A,B)`
    * (`migrations/20260102130331_init/migration.sql:70-75`). */
  val companyToFirmService: StructType = StructType(Seq(
    StructField("A", StringType, nullable = false),
    StructField("B", StringType, nullable = false)))

  val crmSyncEvent: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("companyId", StringType, nullable = false),
    StructField("status", BooleanType, nullable = true),
    StructField("notes", StringType, nullable = true),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  val notification: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("message", StringType, nullable = false),
    StructField("metadata", StringType, nullable = true), // JSON string
    StructField("serviceName", StringType, nullable = false),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  /** `enum EnumServiceName` (`schema.prisma:101-105`). */
  val serviceNames: Seq[String] =
    Seq("Places_Locator", "Website_Content_Scrapper", "CRM_Sync")
}

/** All six tables over one catalog — the "database". */
final class PipelineStore(spark: SparkSession, val catalog: Catalog) {
  private def table(name: String, schema: StructType, uniq: Seq[Seq[String]],
                    partitionCols: Seq[String] = Nil): GraftTable =
    new GraftTable(spark, catalog, name, schema, uniq,
      timestampCols = Seq("createdAt", "updatedAt"), partitionCols = partitionCols)

  // unique keys per migration.sql:77-90 + 20260102193542:8; the two
  // status-polled queue tables are laid out partitioned by status so the
  // pending-slice poll prunes to one partition (SURVEY §4.2)
  val urls: GraftTable = table("google_place_url_to_scrape",
    Entities.googlePlaceUrlToScrape, Seq(Seq("id"), Seq("url")),
    partitionCols = Seq("status"))
  val places: GraftTable = table("place_entry",
    Entities.placeEntry, Seq(Seq("id"), Seq("url")),
    partitionCols = Seq("status"))
  val companies: GraftTable = table("company",
    Entities.company, Seq(Seq("id"), Seq("name")))
  val services: GraftTable = table("firm_service",
    Entities.firmService, Seq(Seq("id"), Seq("name")))
  val companyServices: GraftTable = table("company_to_firm_service",
    Entities.companyToFirmService, Seq(Seq("A", "B")))
  val crmEvents: GraftTable = table("crm_sync_event",
    Entities.crmSyncEvent, Seq(Seq("id"), Seq("companyId")))
  val notifications: GraftTable = table("notification",
    Entities.notification, Seq(Seq("id")))

  // CrmSyncEvent.companyId → Company.id is ON DELETE RESTRICT
  // (migration.sql:93, schema.prisma:80-82): deleting a company with a live
  // sync event raises P2003. The implicit M-N join table's FKs CASCADE
  // (migration.sql:96-99): deleting a company (or service) auto-removes
  // its link rows in the same commit, exactly as Postgres does — the
  // stage-3 compensation path (delete links, then companies, one
  // transaction, syncCrm.ts:108-113) still works; its explicit link
  // delete just leaves nothing for the cascade to find.
  companies.onDeleteRestrict(crmEvents, "companyId", "id")
  companies.onDeleteCascade(companyServices, "A", "id")
  services.onDeleteCascade(companyServices, "B", "id")
}

/** Legal-services tag vocabulary gate. The reference constrains extracted
  * services to a fixed 127-value enum (`scrapeWebsite.ts:22-152`); the
  * vocabulary is injectable data here, with a representative default. */
object ServiceVocabulary {
  val default: Seq[String] = Seq(
    "Family Law", "Criminal Defense", "Personal Injury", "Immigration Law",
    "Corporate Law", "Employment Law", "Real Estate Law", "Tax Law",
    "Estate Planning", "Bankruptcy Law", "Intellectual Property",
    "Civil Litigation", "Medical Malpractice", "Workers Compensation",
    "Contract Law", "Environmental Law", "Insurance Law", "Securities Law",
    "Construction Law", "Entertainment Law", "Aviation Law", "Admiralty Law",
    "Elder Law", "Education Law", "Military Law", "Municipal Law",
    "Probate", "Landlord Tenant Law", "Consumer Protection", "Class Action")
}
