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
    * extraction) as one scan-side plan. EVERY response record of the
    * archive yields a row (a real Common Crawl `.warc.gz` carries
    * thousands of fetches): the file is parsed once
    * ([[WarcKernels.warcPages]]) and the per-page rows explode out of
    * that single pass. */
  def pages(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(path)
      .select(col("path").as("file"),
        explode(WarcExpressions.warcPages(col("content"))).as("p"))
      .select(col("file"), col("p.uri").as("uri"),
        graft.functions.HtmlExpressions.htmlText(col("p.body")).as("text"))

  /** One row per extracted page of every WET file under `path`:
    * (file, uri, text). WET is the EXTRACTED-text sibling Common Crawl
    * publishes beside each WARC (and what most LLM pipelines actually
    * consume): `conversion` records whose payload is the page's plain
    * text — no HTTP envelope, no HTML. Same fail-closed walk and
    * per-file parallelism as [[pages]]. */
  def wetTexts(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wet.gz").load(path)
      .select(col("path").as("file"),
        explode(WarcExpressions.wetTexts(col("content"))).as("p"))
      .select(col("file"), col("p.uri").as("uri"), col("p.text").as("text"))

  /** The file listing the streaming walks iterate — binaryFile with ONLY
    * `path` projected, so the scan never materializes file contents. */
  private def fileList(spark: SparkSession, path: String) = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz").load(path)
      .select(col("path")).as[String]
  }

  /** The session's Hadoop configuration made executor-shippable —
    * Spark's own `SerializableConfiguration` is `private[spark]`, so the
    * write/readFields round-trip is spelled out here. Without this the
    * streaming walks would open files with a bare `new Configuration()`
    * and lose every session-configured filesystem (S3A credentials,
    * custom schemes) that the binaryFile listing resolves fine. */
  private final class SerializableHadoopConf(
      @transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
    def value: org.apache.hadoop.conf.Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  private def sessionConf(spark: SparkSession): SerializableHadoopConf =
    new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)

  /** Opens `p` under the session's Hadoop conf with a task-completion
    * close hook, so an early-terminated consumer (limit, take) never
    * leaks the stream. */
  private def openStream(p: String, conf: SerializableHadoopConf): java.io.InputStream = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val in = hp.getFileSystem(conf.value).open(hp)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: Exception => }))
    in
  }

  private def withFileContext[T](p: String, it: Iterator[T]): Iterator[T] =
    new Iterator[T] {
      private def ctx[A](body: => A): A =
        try body
        catch { case e: Exception =>
          throw new IllegalStateException(
            s"corrupt WARC archive $p: ${e.getMessage}", e) }
      override def hasNext: Boolean = ctx(it.hasNext)
      override def next(): T = ctx(it.next())
    }

  /** STREAMING record listing — [[records]]'s bounded-heap twin. The
    * expression path materializes the whole decompressed archive per
    * task (~4 GB for a 1 GB `.warc.gz`); this walk holds O(record
    * header) — the WARC header block plus a ≤64 KB HTTP prefix —
    * regardless of payload sizes ([[WarcStream]]), so Common
    * Crawl-sized members run in default task memory. Same output
    * schema as [[records]]. Fail-closed differs BY NECESSITY: an
    * iterator cannot retract rows it already emitted, so a structural
    * violation THROWS (job failure naming the file) instead of
    * yielding zero records — at 100 TB a corrupt archive should stop
    * the job, not silently shrink the corpus. */
  def recordsStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = sessionConf(spark)
    fileList(spark, path).mapPartitions { paths =>
      paths.flatMap { p =>
        withFileContext(p,
          WarcStream.records(openStream(p, conf), withBodies = false)
            .map(r => (p, r.pos, r.recType, r.uri, r.httpStatus, r.mime)))
      }
    }.toDF("file", "pos", "rec_type", "uri", "http_status", "mime")
  }

  /** STREAMING page extraction — [[pages]]'s bounded-heap twin: one
    * body held at a time (O(largest record), never O(archive)), decoded
    * charset-aware and boilerplate-stripped exactly like [[pages]].
    * Same throw-on-corruption contract as [[recordsStream]]. */
  def pagesStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = sessionConf(spark)
    fileList(spark, path).mapPartitions { paths =>
      paths.flatMap { p =>
        withFileContext(p,
          WarcStream.records(openStream(p, conf), withBodies = true)
            .filter(r => r.recType == "response" && r.httpStatus >= 0)
            .map { r =>
              val text = graft.functions.HtmlKernels.htmlText(
                WarcStream.pageText(r))
              (p, r.uri, if (text == null) null else text.toString)
            })
      }
    }.toDF("file", "uri", "text")
  }
}
