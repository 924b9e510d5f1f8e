package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import DataQuality._

  private val frame = Seq(
    (1L, Some("alpha"), 10L),
    (2L, Some("beta"), 20L),
    (2L, Some("gamma"), 30L),
    (4L, None, 40L),
    (5L, Some("alpha"), -5L))
    .toDF("id", "name", "score")

  test("audit: hand-computed metrics and pass/fail per check") {
    val out = audit(frame, Seq(
      Completeness("name", 0.8),         // 4/5 = 0.8 -> passes (>=)
      Uniqueness("id", 1.0),             // 4/5 = 0.8 -> fails (dup id 2)
      Uniqueness("name", 0.5),           // 3 distinct non-null / 5 = 0.6
      Compliance("positive_score", $"score" > 0, 0.9), // 4/5 -> fails
      MeanAtLeast("score", 19.0)))       // mean = 95/5 = 19 -> passes
      .select("check", "column", "value", "passed")
      .as[(String, String, Double, Boolean)].collect()

    assert(out.length == 5, "one row per check, in declaration order")
    assert(out(0) == (("completeness", "name", 0.8, true)))
    assert(out(1) == (("uniqueness", "id", 0.8, false)))
    assert(out(2) == (("uniqueness", "name", 0.6, true)))
    assert(out(3) == (("compliance", "positive_score", 0.8, false)))
    assert(out(4) == (("mean_at_least", "score", 19.0, true)))
  }

  test("audit: null predicate input counts as non-compliant") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("v")
    val r = audit(df, Seq(Compliance("v_big", $"v" > 0, 1.0)))
      .select("value", "passed").as[(Double, Boolean)].head()
    // 2 of 3 rows satisfy; the null row cannot prove compliance
    assert(r == ((0.666667, false)))
  }

  test("audit: empty frame reports 0 and fails, never nulls") {
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    val out = audit(empty, Seq(
      Completeness("name", 0.5),
      Uniqueness("id", 0.1),
      Compliance("id_pos", $"id" > 0, 0.0),
      MeanAtLeast("id", 0.0)))
      .select("value", "passed").as[(Double, Boolean)].collect()
    assert(out.forall(_._1 == 0.0))
    // threshold 0.0 checks still "pass" at value 0 (>=); nothing is null
    assert(out.map(_._2).toSeq == Seq(false, false, true, true))
  }

  test("audit: approx uniqueness tracks the exact ratio") {
    val df = (1L to 1000L).map(i => i % 250).toDF("k")
    val Seq(exact, approxV) = audit(df, Seq(
      Uniqueness("k", 0.2),
      Uniqueness("k", 0.2, approx = true)))
      .select("value").as[Double].collect().toSeq
    assert(exact == 0.25)
    assert(math.abs(approxV - exact) / exact < 0.1,
      s"HLL estimate $approxV should be within 10% of $exact")
  }

  test("suggest: emits only the checks the data currently satisfies") {
    val out = suggest(frame, Seq("id", "name", "score"))
      .orderBy($"column", $"check")
      .select("column", "check", "threshold")
      .as[(String, String, Double)].collect().toSeq
    assert(out == Seq(
      // id: complete, NOT key-like (dup 2), bounded
      ("id", "completeness", 1.0),
      ("id", "max_at_most", 5.0),
      ("id", "min_at_least", 1.0),
      // name: one null -> floored observed ratio, not key-like
      ("name", "completeness", 0.8),
      // score: complete, all-distinct -> key-like, bounded
      ("score", "completeness", 1.0),
      ("score", "max_at_most", 40.0),
      ("score", "min_at_least", -5.0),
      ("score", "uniqueness", 1.0)))
  }

  test("suggest: auditing a frame against its own suggestions passes") {
    val sug = suggest(frame, Seq("id", "name", "score"))
      .collect().map { r =>
        (r.getString(0), r.getString(1), r.getDouble(2)) match {
          case (c, "completeness", t) => Completeness(c, t)
          case (c, "uniqueness", t)   => Uniqueness(c, t)
          case (c, "min_at_least", t) =>
            Compliance(s"${c}_min", frame(c) >= t, 1.0)
          case (c, "max_at_most", t) =>
            Compliance(s"${c}_max", frame(c) <= t, 1.0)
        }
      }.toSeq
    val results = audit(frame, sug).select("passed").as[Boolean].collect()
    assert(results.nonEmpty && results.forall(identity),
      "self-suggested constraints must self-audit green")
  }

  test("monitor: audits each micro-batch independently with its batch id") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dqmon").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Option[String])]
    val seen = scala.collection.mutable.Map.empty[Long, Map[String, Double]]
    val q = DataQuality.monitor(
      input.toDF().toDF("id", "name"),
      Seq(Completeness("name", 0.8), Uniqueness("id", 1.0)),
      ckpt, org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)) {
      (rows, bid) =>
        seen.synchronized {
          seen(bid) = rows.select("check", "value")
            .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        }
        ()
    }
    try {
      input.addData((1L, Some("a")), (2L, None), (2L, Some("b")), (4L, Some("c")))
      q.processAllAvailable()
      input.addData((5L, Some("d")), (6L, Some("e")))
      q.processAllAvailable()
    } finally q.stop()
    // batch 0: 3/4 names present, 3/4 distinct ids; batch 1: clean
    assert(seen(0L) == Map("completeness" -> 0.75, "uniqueness" -> 0.75))
    assert(seen(1L) == Map("completeness" -> 1.0, "uniqueness" -> 1.0))
  }

  test("audit: single Aggregate pass (one row source, no join)") {
    val plan = audit(frame, Seq(
      Completeness("name", 0.5),
      Compliance("pos", $"score" > 0, 0.5),
      MeanAtLeast("score", 0.0)))
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, "all checks must compile into one Aggregate")
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 1)
  }
}
