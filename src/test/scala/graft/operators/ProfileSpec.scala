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
}
