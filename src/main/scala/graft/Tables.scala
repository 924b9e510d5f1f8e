package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (see TESTDATA.md).
  *
  * Tables are plain parquet, one file per table, at `\$sfDir/\$name.parquet`.
  * All reads go through here so that scan-level concerns (schema, future
  * partitioning / bucketing at 100 TB scale) live in one place. At cluster
  * scale these would be partitioned table roots (e.g. `orders/o_orderdate=…`)
  * and the same API holds.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred-schema cache: the first read of a table pays the parquet
    * footer-inference job; every later read passes the schema explicitly
    * and schedules nothing. Keyed by path + the nanos legacy flag (the one
    * session conf that changes an inferred schema here: events.ts reads as
    * LONG under it, TIMESTAMP(NANOS) otherwise). Test corpora are
    * immutable for the life of the JVM, so the cache never invalidates. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val key = path + "|" +
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").getOrElse("")
    val cached = schemaCache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(key, df.schema)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Type-adaptive event-time adapter — the producer-side encoding of a
    * timestamp column is NOT under this engine's control (at 100 TB scale
    * upstream writers vary: ns-as-INT64, µs TIMESTAMP_NTZ, µs TIMESTAMP),
    * so ingestion adapts to the footer schema instead of pinning one:
    *
    *   - `LongType`  — legacy parquet TIMESTAMP(NANOS) read under
    *     `spark.sql.legacy.parquet.nanosAsLong=true`: EXACT integer ns→µs
    *     (`div`, not `/` — a double divide loses precision past 2^53);
    *   - `TimestampNTZType` — cast to session-TZ TimestampType. Sessions
    *     run UTC, so the cast is value-preserving AND the column becomes
    *     watermark-eligible (`withWatermark` rejects NTZ in Spark 4);
    *   - `TimestampType` — already event-time-ready, passed through.
    *
    * Keyed by column NAME (the expr must reference it) so the shape can't
    * silently convert a different column than the one passed. Shared by
    * [[events]], the streaming reader, and the gate queries — one contract,
    * one place to grow when the next encoding shows up. */
  def eventTime(schema: org.apache.spark.sql.types.StructType,
                name: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    schema(name).dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr(s"`$name` div 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(name).cast(org.apache.spark.sql.types.TimestampType)
      case _ => col(name)
    }
  }

  /** `events` with `ts` normalized to TimestampType via [[eventTime]],
    * whatever the file's physical encoding. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.withColumn("ts", eventTime(raw.schema, "ts"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view for the `spark.sql` raw-SQL surface
    * (SURVEY §2.A #18 — the Prisma `\$queryRaw` equivalent). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
