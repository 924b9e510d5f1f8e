package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-lifecycle experiment bench (r18 item 3): times the same
  * AvailableNow stream bodies under candidate state-store / checkpoint
  * configurations, so the gate harness only adopts knobs with a measured
  * win. Each variant runs the body twice and prints both (first pays
  * plan codegen). Dev tooling only. */
object ProfileStream {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftLogging.silenceKnownNoise()

    def tempDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      d.toFile.deleteOnExit()
      d.toString
    }

    def runStream(stream: DataFrame, mode: String): Unit = {
      val tmp = tempDir("prof-stream")
      val out = tmp + "/out"
      val q = stream.writeStream.outputMode(mode)
        .foreachBatch { (b: DataFrame, bid: Long) =>
          val dir = if (mode == "complete") out else s"$out/b$bid"
          b.write.mode("overwrite").parquet(dir); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp + "/ckpt").start()
      q.awaitTermination(180000)
      ()
    }

    // the three state shapes the gate family exercises
    def joinBody(): Unit = runStream(
      graft.streaming.Streaming.attributionJoin(
        graft.streaming.Streaming.readEventStream(spark, sfDir),
        "view", "click", joinType = "left_outer"), "append")
    def aggBody(): Unit = runStream(
      graft.streaming.Streaming.windowedAggregates(
        graft.streaming.Streaming.readEventStream(spark, sfDir)), "complete")
    def dedupBody(): Unit = runStream(
      graft.streaming.Streaming.streamingDedup(
        graft.streaming.Streaming.readEventStream(spark, sfDir)
          .select(col("event_id"), col("ts"),
            col("event_type").as("text")), "text", "ts"), "append")
    def trivialBody(): Unit = runStream(
      graft.streaming.Streaming.readEventStream(spark, sfDir)
        .select(col("event_id"), col("ts")), "append")

    val variants: Seq[(String, Map[String, String])] = Seq(
      "baseline(hdfs,4part)" -> Map(
        "spark.sql.shuffle.partitions" -> "4"),
      "hdfs,1part" -> Map(
        "spark.sql.shuffle.partitions" -> "1"),
      "hdfs,4part,retain2" -> Map(
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.minBatchesToRetain" -> "2"),
      "rocksdb,4part" -> Map(
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "hdfs,4part,unsaferow" -> Map(
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.streaming.stateStore.formatValidation.enabled" -> "false"))

    val bodies: Seq[(String, () => Unit)] = Seq(
      "trivial" -> (() => trivialBody()),
      "join" -> (() => joinBody()),
      "agg" -> (() => aggBody()),
      "dedup" -> (() => dedupBody()))

    variants.foreach { case (vname, conf) =>
      val saved = conf.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try bodies.foreach { case (bname, body) =>
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          body()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[stream] $vname%-24s $bname%-8s " +
          f"first=${times(0)}%5.2f s  warm=${times(1)}%5.2f s")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
