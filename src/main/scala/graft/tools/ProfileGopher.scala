package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Per-stat cost attribution for gopherStats at sf1. Dev tooling only. */
object ProfileGopher {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).repartition(32).cache()
    docs.count()
    val text = col("text")
    val ws = TextFunctions.wsClass
    val wst = TextFunctions.wsTrim(text)

    time("baseline len")(noop(docs.select(length(text))))
    time("wsTrim")(noop(docs.select(length(wst))))
    time("nWords split")(noop(docs.select(size(split(wst, ws + "+")))))
    time("sumWordLen")(noop(docs.select(length(regexp_replace(wst, ws + "+", "")))))
    time("occurrences #/...")(noop(docs.select(
      length(regexp_replace(text, java.util.regex.Pattern.quote("#"), "")) +
        length(regexp_replace(text, java.util.regex.Pattern.quote("..."), "")))))
    time("letterless lookaround")(noop(docs.select(
      regexp_count(wst, lit(s"(?<=^|$ws)[^a-zA-Z \\t\\n\\f\\r]+(?=$$|$ws)")))))
    time("sw_hits tokens")(noop(docs.select(size(array_intersect(
      array(graft.operators.QualityRules.probeStopwords.map(lit): _*),
      TextFunctions.tokens(text))))))
    time("bullet regex")(noop(docs.select(regexp_count(text, lit("(?md)^ *[-*•]")))))
    time("ellipsis regex")(noop(docs.select(
      regexp_count(text, lit("(?md)(\\.\\.\\.|…) *$")))))

    val full = graft.operators.QualityRules.gopherStats(docs, "text",
      graft.operators.QualityRules.Thresholds(minWords = 40, minStopwordHits = 1))
    time("full gopherStats")(noop(full))
    val plan = full.queryExecution.executedPlan.toString
    println("[profile] wholestage spans: " +
      "WholeStageCodegen".r.findAllIn(plan).size + ", plan head:")
    println(plan.linesIterator.take(12).mkString("\n"))

    // pre-materialize wst once as a column, derive stats from it
    time("full gopherStats (filter only)")(noop(
      graft.operators.QualityRules.gopherFilter(docs, "text",
        graft.operators.QualityRules.Thresholds(minWords = 40, minStopwordHits = 1))))
    spark.stop()
  }
}
