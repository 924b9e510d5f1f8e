package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("observeStatus counts ride the job itself (no second scan)") {
    val df = Seq(
      ("a", Some(true)), ("b", Some(true)), ("c", Some(false)),
      ("d", Option.empty[Boolean]), ("e", Option.empty[Boolean])
    ).toDF("id", "status")
    val (observed, obs) = Metrics.observeStatus(df)
    observed.write.format("noop").mode("overwrite").save() // one action
    val m = obs.get
    assert(m("processed") == 5L && m("succeeded") == 2L
      && m("failed") == 1L && m("pending") == 2L)
  }

  test("periodic reporter emits gauge rows at interval boundaries") {
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val rep = new MetricsReporter(intervalMs = 100)
    rep.register("processed")(counter.get())
    rep.register("failed")(0L)
    rep.start()
    try {
      counter.set(3)
      Thread.sleep(380)
      counter.set(7)
      Thread.sleep(250)
    } finally rep.stop()
    val rows = rep.reports
    val processed = rows.filter(_.name == "processed")
    // ~6 intervals elapsed; allow generous scheduling slop
    assert(processed.size >= 3, s"expected >=3 interval samples, got ${processed.size}")
    assert(rows.count(_.name == "failed") == processed.size)
    // samples reflect the gauge value AT the boundary (3 early, 7 late)
    assert(processed.head.value == 3L && processed.last.value == 7L)
    // timestamps are spaced by roughly the interval
    val gaps = processed.map(_.atMs).sliding(2).collect { case Seq(a, b) => b - a }.toSeq
    assert(gaps.forall(_ >= 50), s"samples not interval-spaced: $gaps")
    // stopped reporter emits nothing further
    val n = rep.reports.size
    Thread.sleep(250)
    assert(rep.reports.size == n)
  }

  test("streaming locator reports observed metrics at every trigger boundary") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-metrics-stream")
    val inbox = tmp.resolve("inbox"); java.nio.file.Files.createDirectories(inbox)
    val store = new PipelineStore(spark,
      new graft.store.Catalog(tmp.resolve("store").toString))
    def urlBatch(ids: Seq[Int]) = ids.map(i =>
      (s"g$i", s"https://maps.example/m$i", Some("L")))
      .toDF("id", "url", "location")
      .withColumn("status", lit(null).cast(BooleanType))
      .withColumn("notes", lit(null).cast(StringType))
      .withColumn("createdAt", lit(null).cast(TimestampType))
      .withColumn("updatedAt", lit(null).cast(TimestampType))

    val listener = new ObservedMetricsListener
    spark.streams.addListener(listener)
    try {
      val loc = new graft.streaming.IncrementalLocator(store,
        new SyntheticPlacesExtractor(1), inbox.toString, tmp.resolve("ckpt").toString)
      urlBatch(1 to 8).coalesce(1).write.mode("append").parquet(inbox.toString)
      loc.runOnce(spark)
      urlBatch(9 to 12).coalesce(1).write.mode("append").parquet(inbox.toString)
      loc.runOnce(spark)
      // data-bearing micro-batches carried the observed ingest counters
      val withData = listener.batches.filter(_.numInputRows > 0)
      assert(withData.size >= 2, s"expected >=2 data batches, got ${listener.batches}")
      assert(withData.map(_.observed("locator_ingest.rows")).sum == 12L)
      assert(withData.forall(b =>
        b.observed("locator_ingest.pending") == b.observed("locator_ingest.rows")))
    } finally spark.streams.removeListener(listener)
  }

  test("duration histogram matches the reference bucket shape") {
    val df = Seq(500.0, 1500.0, 1500.0, 9999.0, 20000.0).toDF("ms")
    val h = Metrics.durationHistogram(df, "ms").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h == Map(1 -> 1L, 2 -> 2L, 10 -> 1L, 11 -> 1L))
  }
}
