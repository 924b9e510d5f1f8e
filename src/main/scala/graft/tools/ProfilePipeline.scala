package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_pipeline's sf1 cost (round-10: 29.9 s, the most
  * expensive query in the suite). Times each stage of the curation
  * composition separately. Dev tooling only. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).repartition(32)
    time("scan only")(noop(docs))

    val kept = graft.operators.QualityRules.gopherFilter(docs, "text",
      graft.operators.QualityRules.Thresholds(minWords = 40, minStopwordHits = 1))
    time("gopher filter")(noop(kept))

    val deduped = graft.operators.Dedup.exactByKey(kept, md5(col("text")), "doc_id")
    time("+ exact dedup")(noop(deduped))

    val split = deduped.withColumn("split",
        graft.operators.Sampling.hashSplitAssign(col("text"),
          Seq(("train", 0.8), ("val", 0.9)), "test"))
      .withColumn("n_tok", graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
    time("+ split + tokcount")(noop(split))

    val train = graft.operators.Packing.assignShardsByTokenBudget(
        split.filter(col("split") === "train"),
        Seq(col("source"), col("doc_id")), col("n_tok"), budget = 3000L)
      .select(col("doc_id"), col("source"), col("split"), col("n_tok"), col("shard"))
    time("+ shard assignment")(noop(train))

    val full = graft.SparkEntry.queries("q_pipeline")(spark, sfDir)
    time("full q_pipeline")(noop(full))
    time("full q_pipeline (2nd)")(noop(full))
    spark.stop()
  }
}
