package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reading `.warc.gz` crawl archives into DataFrames — the engine's raw
  * web-corpus source.
  *
  * Layout at scale: gzip is not splittable, so the file is the unit of
  * parallelism — exactly how Common Crawl ships (one crawl ≈ 64k files of
  * ~1 GB, so a 1000-executor cluster gets ~64 task waves with zero
  * splitting logic). `binaryFile` gives one row per file; the record walk
  * ([[WarcKernels]]) is a codegen'd scan-side column, so the plan is
  * scan → project → generate with no shuffle until the caller aggregates.
  *
  * Memory: a file's bytes materialize per task (binaryFile semantics).
  * For Common Crawl-sized members that is ~1 GB/task — fine at the
  * default one-core-per-task executor shape; for larger archives, point
  * the reader at a manifest subset per job rather than raising task
  * memory.
  */
object Warc {

  /** One row per WARC record across every `.warc.gz` under `path`:
    * (file, pos, rec_type, uri, http_status, mime). Invalid files yield
    * zero records (fail-closed, like the media decode boundary) — audit
    * them by anti-joining the file listing against the output. */
  def records(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(path)
      .select(col("path").as("file"),
        explode(WarcExpressions.warcRecords(col("content"))).as("r"))
      .select(col("file"), col("r.pos").as("pos"),
        col("r.rec_type").as("rec_type"), col("r.uri").as("uri"),
        col("r.http_status").as("http_status"), col("r.mime").as("mime"))

  /** One row per successfully fetched HTML page: (file, uri, text) with
    * `text` the boilerplate-stripped main text — the complete crawl
    * front door (gzip member decode → WARC walk → HTTP split → HTML
    * extraction) as one scan-side plan; the file is parsed ONCE
    * ([[WarcKernels.warcPage]]). */
  def pages(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(path)
      .select(col("path").as("file"),
        WarcExpressions.warcPage(col("content")).as("p"))
      .filter(col("p").isNotNull)
      .select(col("file"), col("p.uri").as("uri"),
        graft.functions.HtmlExpressions.htmlText(col("p.body")).as("text"))
}
