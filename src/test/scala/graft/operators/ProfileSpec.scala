package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("profiles nulls, distincts, and numeric bounds per column in one pass") {
    val df = Seq(
      (Some(9L), Some("b")), (Some(10L), Some("a")),
      (None, Some("a")), (Some(2L), None))
      .toDF("v", "t")
    val out = Profile.profile(df, Seq("v", "t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // min/max computed BEFORE stringify: 2..10, not "10".."9"
    assert(out("v") == ((4L, 1L, 3L, "2", "10")))
    assert(out("t") == ((4L, 1L, 2L, "a", "b")))
  }

  test("single aggregation: the plan scans the input once") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("v", "t")
    val plan = Profile.profile(df, Seq("v", "t"))
      .queryExecution.executedPlan.toString
    // the multi-distinct compiles to Expand over one scan, not per-column
    // re-scans stitched by union
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("drift of a slice against itself is zero in every bin") {
    val df = Seq(1.0, 7.0, 55.0, 120.0, 120.5).toDF("v")
    val psi = Profile.drift(df, df, "v", binWidth = 50.0)
      .select($"psi").as[Double].collect()
    assert(psi.nonEmpty && psi.forall(_ == 0.0))
  }

  test("quantileAudit returns exact interpolated percentiles") {
    // 1..100 → p=0.5 interpolates to 50.5, p=0.25 to 25.75
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    val got = Profile.quantileAudit(df, "k", "v", Seq(0.25, 0.5))
      .select($"p", $"q").as[(Double, Double)].collect().toMap
    assert(got(0.25) == 25.75 && got(0.5) == 50.5)
  }

  test("quantileAudit: an all-NULL group is skipped, not an NPE") {
    val df = ((1 to 50).map(i => ("g", Some(i.toDouble))) :+
      (("empty", Option.empty[Double]))).toDF("k", "v")
    val got = Profile.quantileAudit(df, "k", "v", Seq(0.5))
      .select($"k", $"q").as[(String, Double)].collect().toMap
    // the valueless group has no order statistics and drops from the
    // output (explode of the null quantile array); no NPE in the audit
    assert(got == Map("g" -> 25.5))
  }

  test("drift ignores NULL values instead of binning them") {
    val a = Seq(Some(10.0), None, Some(20.0)).toDF("v")
    val b = Seq(Some(10.0), Some(20.0), None).toDF("v")
    val rows = Profile.drift(a, b, "v", binWidth = 50.0)
      .select($"bin", $"psi").as[(Long, Double)].collect().toSeq
    assert(rows == Seq((0L, 0.0)), rows.toString)
  }

  test("quantileAudit rejects a tolerance tighter than the sketch bound") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Profile.quantileAudit(df, "k", "v", Seq(0.5), accuracy = 100,
        tolProb = 0.001)
    }
  }

  test("a shifted distribution yields positive total PSI and union bins") {
    val a = Seq(10.0, 20.0, 30.0, 40.0).toDF("v")     // all in bin 0
    val b = Seq(110.0, 120.0, 130.0, 140.0).toDF("v") // all in bin 2
    val rows = Profile.drift(a, b, "v", binWidth = 50.0)
      .select($"bin", $"n_a", $"n_b", $"psi")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq(0L, 2L), "union of observed bins")
    assert(rows.map(r => (r._2, r._3)) == Seq((4L, 0L), (0L, 4L)))
    assert(rows.map(_._4).sum > 0.25, "conventional 'shifted' band")
  }

  test("frequencyAudit returns exact counts and passes the sketch bound") {
    val df = (Seq.fill(40)("hot") ++ (1 to 25).map(i => s"cold-$i") ++
      Seq(null.asInstanceOf[String])).toDF("v")
    val got = Profile.frequencyAudit(df, "v")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got(Some("hot")) == 40L)
    assert(got(Some("cold-7")) == 1L)
    // NULL group rides the exact output (SQL GROUP BY semantics) but is
    // skipped by the sketch audit — md5-free, like every other profile op
    assert(got(None) == 1L)
    assert(got.size == 27)
  }

  test("frequencyAudit audits under Spark's cast rendering, not the JVM's") {
    // java.sql.Timestamp.toString appends '.0' where Spark's cast does
    // not — auditing with the JVM rendering would miss every sketch
    // increment and abort the est >= exact bound spuriously
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val df = Seq.fill(5)(ts).toDF("v")
    val got = Profile.frequencyAudit(df, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("2026-01-01 00:00:00" -> 5L))
  }

  test("frequencyAudit refuses unbounded cardinality unless values are named") {
    val df = (1 to 50).map(i => s"v-$i").toDF("v")
    // above the cap with no explicit audit set: refuse loudly (a 100 TB
    // high-cardinality column would otherwise collect to the driver)
    val e = intercept[IllegalArgumentException] {
      Profile.frequencyAudit(df, "v", maxAuditValues = 10)
    }
    assert(e.getMessage.contains("auditValues"))
    // explicit audit values bound the collect and still verify the bound
    val got = Profile.frequencyAudit(df, "v", maxAuditValues = 10,
        auditValues = Seq("v-1", "v-2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == 50 && got("v-1") == 1L, "returned frame stays full")
  }
}
