package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Producer-encoding regression gate for event-time ingestion.
  *
  * Round 8 failure mode: the fixture producer switched `events.ts` from
  * parquet TIMESTAMP(NANOS) (read as INT64 under nanosAsLong) to
  * TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ), and
  * the schema-pinned streaming reader silently compressed every event
  * time 1000× (ns→µs `div 1000` applied to µs) while `withWatermark`
  * hard-crashed on NTZ. This spec writes the SAME events in all three
  * encodings and asserts batch + streaming ingestion produce identical
  * instants and identical query results — so the next producer-side
  * encoding change fails loudly here instead of silently skewing time.
  */
class EventTimeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (event_id, user_id, event_type, value, ts_micros) — user 1 has a
  // click 30 min after a view (in the 60-min attribution window) and one
  // 90 min after (outside); user 2 only a view.
  private val baseUs = 1700000000000000L
  private def us(min: Int): Long = baseUs + min * 60L * 1000000L
  private val rows = Seq(
    (1L, 1L, "view", 1.0, us(0)),
    (2L, 1L, "click", 2.0, us(30)),
    (3L, 1L, "click", 3.0, us(90)),
    (4L, 2L, "view", 4.0, us(10)))

  /** Write the fixture with `ts` in one of the three producer encodings;
    * returns the directory whose `events.parquet` holds it. */
  private def writeEncoding(kind: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-evt-$kind").toString
    val base = rows.toDF("event_id", "user_id", "event_type", "value", "ts_us")
      .withColumn("props", lit("""{"k":1}"""))
    val withTs = kind match {
      case "nanos" => base.withColumn("ts", col("ts_us") * 1000L) // raw INT64 ns
      case "ntz"   => base.withColumn("ts",
        timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      case "ltz"   => base.withColumn("ts", timestamp_micros(col("ts_us")))
    }
    // the driver fixture is a single FILE named events.parquet (not a
    // directory) — mirror that: write to a scratch dir, move the part file
    val scratch = s"$dir/__scratch"
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  // "nanos" writes a plain INT64 column (what nanosAsLong hands back);
  // "nanos_real" is a committed pyarrow-written parquet whose ts is a
  // genuine annotated TIMESTAMP(NANOS) of the SAME four events — the
  // actual round-8-era producer encoding, exercising the real
  // nanosAsLong read path rather than a simulation of its result
  private val encodings = Seq("nanos", "nanos_real", "ntz", "ltz")
  private lazy val dirs: Map[String, String] =
    encodings.map {
      case "nanos_real" => "nanos_real" -> new java.io.File(
        getClass.getResource("/events_nanos/events.parquet").getPath)
        .getParent
      case k => k -> writeEncoding(k)
    }.toMap

  test("Tables.events yields identical TimestampType instants for all encodings") {
    val got = encodings.map { k =>
      val df = Tables.events(spark, dirs(k))
      assert(df.schema("ts").dataType == TimestampType,
        s"$k: ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
      k -> df.select(col("event_id"),
          unix_micros(col("ts")).as("us")).as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    }.toMap
    val expected = rows.map(r => (r._1, r._5))
    encodings.foreach(k => assert(got(k) == expected, s"encoding $k drifted"))
  }

  private def runAttribution(k: String): Set[(Long, Long, Long)] = {
    val joined = Streaming.attributionJoin(
      Streaming.readEventStream(spark, dirs(k)), "view", "click")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(s"evt_enc_$k")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(s"evt_enc_$k")
      .select($"user_id", $"l_id", $"r_id").as[(Long, Long, Long)]
      .collect().toSet
  }

  test("streaming attribution join is encoding-invariant (and correct)") {
    // exactly one pair: user 1's view(1) -> click(2) at +30 min;
    // click(3) at +90 min is outside the 60-min window
    val want = Set((1L, 1L, 2L))
    encodings.foreach(k => assert(runAttribution(k) == want, s"encoding $k"))
  }

  test("watermarked window aggregate runs on every encoding") {
    encodings.foreach { k =>
      val out = Streaming.runWindowedOnce(spark, dirs(k), s"evt_win_$k")
        .select(unix_micros($"window.start").as("ws"), $"event_type", $"n")
        .as[(Long, String, Long)].collect().toSet
      // 1-hour tumbling windows, UTC: view@0,click@30 in window 0;
      // click@90 in window 1; view@+10 in window 0
      val w0 = baseUs - (baseUs % 3600000000L)
      val want = Set((w0, "view", 2L), (w0, "click", 1L),
        (w0 + 3600000000L, "click", 1L))
      assert(out == want, s"encoding $k")
    }
  }
}
