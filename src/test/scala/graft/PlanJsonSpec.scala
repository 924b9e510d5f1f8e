package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the JSON parse-once pass: the barrier must
  * leave exactly ONE try_parse_json in the plan (per JSON field) while the
  * plain scan predicate still reaches the parquet source. */
class PlanJsonSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q_json_array plans ONE parse and keeps the scan filter pushed") {
    val df = SparkEntry.queries("q_json_array")(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    val parses = "VariantExpressionEvalUtils.parseJson".r.findAllIn(physical).length
    assert(parses == 1, s"expected 1 parseJson, found $parses in:\n$physical")
    assert(physical.contains("PushedFilters:") &&
      physical.contains("event_type"),
      "event_type must be pushed to the parquet scan")
  }

  test("mixed JSON + scalar where keeps the scalar conjunct below the barrier") {
    import graft.query._
    val m = new Model(() => Tables.events(spark, dir), "event_id")
    val df = m.findMany(QueryArgs(
      where = Some(And(Seq(
        F.str("event_type", StringF(equals = Some(Some("click")))),
        F.json("props", JsonF(path = Seq("k"), gte = Some(50)))))),
      select = Seq("event_id")))
    val physical = df.queryExecution.executedPlan.toString
    assert("VariantExpressionEvalUtils.parseJson".r.findAllIn(physical).length == 1)
    // the scalar conjunct must reach the scan, not sit above the barrier
    assert(physical.contains("PushedFilters:") && physical.contains("event_type"))
  }
}
