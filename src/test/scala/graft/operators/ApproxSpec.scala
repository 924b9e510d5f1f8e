package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate aggregates — sketch-based cardinality and quantiles, the
  * aggregations a 100 TB profile pass uses where exact answers cost a
  * full shuffle. (No DuckDB oracle: sketch algorithms differ across
  * engines; correctness = bounded error vs the exact answer.) */
class ApproxSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on order keys") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val r = li.agg(
      countDistinct($"l_orderkey").as("exact"),
      approx_count_distinct($"l_orderkey", 0.02).as("approx")).head()
    val exact = r.getAs[Long]("exact").toDouble
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("cardinalityAudit returns exact counts and the sketch stays in tolerance") {
    val out = Profile.cardinalityAudit(
        graft.Tables.events(spark, sfDir), "event_type", "user_id", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == exact)
  }

  test("cardinalityAudit rejects a sketch outside tolerance") {
    // tolSigma = 0 leaves only the ±1 integer slack: a coarse sketch
    // (rsd 0.1) over 10k distinct event_ids cannot land within ±1 of
    // exact, so the audit must throw.
    val e = intercept[IllegalArgumentException] {
      Profile.cardinalityAudit(
        graft.Tables.events(spark, sfDir).withColumn("g", lit("all")),
        "g", "event_id", rsd = 0.1, tolSigma = 0.0)
    }
    assert(e.getMessage.contains("out of tolerance"))
  }

  test("percentile_approx brackets the exact median") {
    val o = graft.Tables.orders(spark, sfDir)
    val approxMed = o.agg(percentile_approx($"o_totalprice", lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exactMed = o.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    assert(math.abs(approxMed - exactMed) / exactMed < 0.02)
  }

  test("streaming dedup drops cross-batch duplicates within the watermark") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft-sdedup")
    val in = tmp.resolve("in"); java.nio.file.Files.createDirectories(in)
    def batch(rows: Seq[(Long, String, java.sql.Timestamp)]) =
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(in.toString)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    batch(Seq(
      (1L, "the quick brown fox", t0),
      (2L, "THE  QUICK brown FOX", t0),   // normalized dup of 1
      (3L, "completely different text", t0)))
    val out = tmp.resolve("out").toString
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .parquet(in.toString)
      val q = graft.streaming.Streaming.streamingDedup(stream, "text", "ts")
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(first.size == 2 && first.contains(3L)) // one of 1/2 + 3
    // second batch: another dup of doc 1 (same event time window) + novel
    batch(Seq(
      (4L, "the quick brown fox!", t0),
      (5L, "yet another novel document", t0)))
    runOnce() // resumes from the checkpoint: dedup state survives
    val second = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(second.contains(5L) && !second.contains(4L)) // cross-batch dup dropped
    assert((second -- first) == Set(5L))
  }
}
