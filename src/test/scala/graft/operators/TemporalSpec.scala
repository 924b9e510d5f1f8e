package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val log = Seq(
    // user 1: A → A (collapse) → B → A again (new version, not a merge)
    (1L, "A", ts("2026-01-01 10:00:00"), 1L),
    (1L, "A", ts("2026-01-01 10:05:00"), 2L),
    (1L, "B", ts("2026-01-01 10:10:00"), 3L),
    (1L, "A", ts("2026-01-01 10:20:00"), 4L),
    // user 2: single event — one current version
    (2L, "X", ts("2026-01-01 09:00:00"), 5L),
    // user 3: same-timestamp tie broken by event_id
    (3L, "P", ts("2026-01-01 08:00:00"), 7L),
    (3L, "Q", ts("2026-01-01 08:00:00"), 6L))

  test("scd2: only transitions create versions; intervals chain half-open") {
    val out = Temporal.scd2(
        log.toDF("user_id", "event_type", "ts", "event_id").repartition(3),
        "user_id", "event_type", "ts", "event_id")
      .orderBy($"user_id", $"version")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, "A", ts("2026-01-01 10:00:00"), Some(ts("2026-01-01 10:10:00")), false),
      (1L, 2L, "B", ts("2026-01-01 10:10:00"), Some(ts("2026-01-01 10:20:00")), false),
      (1L, 3L, "A", ts("2026-01-01 10:20:00"), None, true),
      (2L, 1L, "X", ts("2026-01-01 09:00:00"), None, true),
      // event_id 6 (Q) sorts before 7 (P) at the tied timestamp
      (3L, 1L, "Q", ts("2026-01-01 08:00:00"), Some(ts("2026-01-01 08:00:00")), false),
      (3L, 2L, "P", ts("2026-01-01 08:00:00"), None, true)))
  }

  test("scd2: the three windows share one exchange (single shuffle)") {
    // count on the rendered plan — AQE's wrapper hides exchange nodes
    // from collect() until the final plan materializes
    val plan = Temporal.scd2(
        log.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got:\n$plan")
  }

  test("coOccurrence: counts unordered pairs across baskets, dedups within") {
    val baskets = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (20L, 2L), // duplicate item in basket: counted once
      (30L, 2L), (30L, 1L))
    val out = Temporal.coOccurrence(
        baskets.toDF("basket", "item").repartition(4), "basket", "item", topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("coOccurrence: topN truncates on the deterministic total order") {
    val baskets = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L))
    val out = Temporal.coOccurrence(
        baskets.toDF("basket", "item"), "basket", "item", topN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // all 6 pairs tie at n=1 → (item_a, item_b) ascending decides
    assert(out.toSeq == Seq((1L, 2L), (1L, 3L)))
  }

  test("linearAttribution: 1000 milli-credits split, remainder to latest") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // purchase at t=100 for user 1; touches at 10, 50, 90 → 333/333/334
    // user 2's touch is outside the 60 s window → uncredited
    val conv = Seq((100L, 1L, ts(100)), (200L, 2L, ts(500)))
      .toDF("conv_id", "user_id", "conv_ts")
    val touch = Seq(
      (11L, 1L, ts(50)), (12L, 1L, ts(60)), (13L, 1L, ts(90)),
      (21L, 2L, ts(100)))
      .toDF("touch_id", "user_id", "touch_ts")
    val got = Temporal.linearAttribution(conv, touch, "user_id",
        "conv_ts", "touch_ts", "conv_id", "touch_id", windowSeconds = 60)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(11L -> 333L, 12L -> 333L, 13L -> 334L))
    assert(got.values.sum == 1000L, "credit is conserved per conversion")
  }

  test("retentionMatrix: cohorts by first event, offsets count distinct") {
    import java.sql.Timestamp
    val week = 604800L
    def ts(w: Long) = new Timestamp(w * week * 1000L)
    // u1 joins week 0, active weeks 0,1,2; u2 joins week 0, active 0,2
    // (twice in week 2 — counted once); u3 joins week 1, active 1 only
    val ev = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(2)),
      (2L, ts(0)), (2L, ts(2)), (2L, ts(2)),
      (3L, ts(1)))
      .toDF("user_id", "ts")
    val got = Temporal.retentionMatrix(ev, "user_id", "ts")
      .select($"cohort", $"period_offset", $"n_users")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 1L)))
  }

  test("pointInTime: facts pick the version valid at their instant") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: A@10, B@20 (zero-width: B then C both @20), C@20, then D@30
    val ev = Seq(
      (1L, "A", ts(10), 1L), (1L, "B", ts(20), 2L),
      (1L, "C", ts(20), 3L), (1L, "D", ts(30), 4L))
      .toDF("user_id", "state", "ts", "event_id")
    val hist = Temporal.scd2(ev, "user_id", "state", "ts", "event_id")
    val facts = Seq(
      (100L, 1L, ts(5)),   // before any version → null
      (101L, 1L, ts(15)),  // inside A
      (102L, 1L, ts(20)),  // AT the double transition → C (highest version)
      (103L, 1L, ts(99))). // current → D
      toDF("fact_id", "user_id", "fts")
    val got = Temporal.pointInTime(facts, hist, "user_id", "fts",
        Seq("state", "version"))
      .select($"fact_id", $"state").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(100L -> None, 101L -> Some("A"),
      102L -> Some("C"), 103L -> Some("D")))
  }
}
