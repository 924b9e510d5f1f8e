package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for the named SparkEntry gates to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits next to its bench numbers. Usage:
  * `runMain graft.tools.PlanDump <tag> <suffix> q_a q_b ...`.
  * Lifecycle gates run their whole body (mutations, refreshes) before the
  * final frame exists; the dumped plan is that final read — exactly what
  * the bench's noop sink executes last. Dev tooling only. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftLogging.silenceKnownNoise()
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        new java.io.File(dir, s"${name}_$suffix.txt"), "UTF-8")
      try w.println(plan) finally w.close()
      spark.catalog.clearCache()
      println(s"[plandump] wrote plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
