package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable external-I/O boundaries (SURVEY §2.G, §7.3).
  *
  * In the reference these legs are Playwright-driven Chromium and an LLM
  * extractor (`services/browser.ts`, `scrapeWebsite.ts:184-194`); in a
  * Spark engine they are interfaces taking and returning DataFrames so the
  * surrounding pipeline stays declarative. A production implementation
  * would call the external service inside `mapPartitions` with bounded
  * per-partition concurrency (the semaphore-of-10 analog,
  * `services/browser.ts:21`); tests and benches use deterministic mocks.
  */
trait PlacesExtractor {
  /** rows of google_place_url_to_scrape → candidate place_entry rows
    * (columns: sourceId, name, url, address, telephone, location). */
  def extract(urls: DataFrame): DataFrame
}

trait WebsiteExtractor {
  /** rows of place_entry → company candidates (columns: sourceId, name,
    * websiteUrl, emailAddress, phoneNumber, address, industry, location,
    * servicesOffered array<string>). */
  def extract(places: DataFrame): DataFrame
}

trait CrmSink {
  /** company rows (with serviceNames array) → per-company outcome
    * (columns: companyId, ok boolean, notes). Must be idempotent per
    * company — replays happen (workflow.ts:15-19 idempotency keys). */
  def sync(companies: DataFrame): DataFrame
}

/** Mock extractors driven by a fixture table — extraction becomes a join,
  * which is exactly how a pre-computed extraction cache would look at scale.
  * `results` maps the input key to extracted fields. */
final class TablePlacesExtractor(results: DataFrame) extends PlacesExtractor {
  /** `location` travels from the source url record into every extracted
    * place, as in the reference (`runner/locator.ts:107-111`). */
  def extract(urls: DataFrame): DataFrame =
    urls.select(col("id").as("sourceId"), col("location"))
      .join(results, Seq("sourceId"), "inner")
}

final class TableWebsiteExtractor(results: DataFrame) extends WebsiteExtractor {
  def extract(places: DataFrame): DataFrame =
    places.select(col("id").as("sourceId")).join(results, Seq("sourceId"), "inner")
}

/** Deterministic in-engine CRM sink: succeeds unless the company name
  * contains the poison marker (lets tests exercise the failure path). */
final class DeterministicCrmSink(failMarker: String = "__crm_fail__") extends CrmSink {
  def sync(companies: DataFrame): DataFrame =
    companies.select(
      col("id").as("companyId"),
      (!coalesce(col("name").contains(failMarker), lit(false))).as("ok"),
      when(col("name").contains(failMarker), lit("crm rejected")).as("notes"))
}

/** Hash-derived synthetic extractor — generates plausible deterministic
  * extraction output from the url alone (no fixture needed); used for
  * demos/benches of the pipeline at arbitrary scale. */
final class SyntheticPlacesExtractor(perUrl: Int = 3) extends PlacesExtractor {
  def extract(urls: DataFrame): DataFrame = {
    val exploded = urls.select(col("id").as("sourceId"), col("url"),
        explode(sequence(lit(1), lit(perUrl))).as("i"))
    val h = abs(hash(col("url"), col("i")))
    exploded.select(
      col("sourceId"),
      concat(lit("Firm "), (h % 100000).cast("string")).as("name"),
      concat(col("url"), lit("/place/"), col("i").cast("string")).as("url"),
      when(h % 7 === 0, lit("1 Main St, United States"))
        .when(h % 7 === 1, lit(null).cast(StringType))
        .otherwise(concat(lit("1 Main St, City "), (h % 50).cast("string"))).as("address"),
      when(h % 5 === 0, concat(lit("+1 "), (h % 10000000).cast("string")))
        .otherwise(concat(lit("+44 "), (h % 10000000).cast("string"))).as("telephone"),
      concat(lit("Location "), (h % 20).cast("string")).as("location"))
  }
}

final class SyntheticWebsiteExtractor(vocab: Seq[String] = ServiceVocabulary.default)
    extends WebsiteExtractor {
  def extract(places: DataFrame): DataFrame = {
    val h = abs(hash(col("url")))
    val vocabArr = array(vocab.map(lit): _*)
    places.select(
      col("id").as("sourceId"),
      coalesce(col("name"), lit("Default Name")).as("name"),
      col("url").as("websiteUrl"),
      when(h % 11 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("contact@firm"), (h % 100000).cast("string"), lit(".example"))).as("emailAddress"),
      col("telephone").as("phoneNumber"),
      col("address"),
      lit("Legal Services").as("industry"),
      col("location"),
      when(h % 13 === 0, array().cast(ArrayType(StringType)))
        .otherwise(slice(vocabArr, (h % vocab.size).cast("int") + 1,
          (h % 3).cast("int") + 1)).as("servicesOffered"))
  }
}
