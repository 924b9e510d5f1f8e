package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-tier interval-join rewrite: result parity with the
  * naive plan, nested-loop elimination, edge semantics (strict bounds,
  * descending/NULL intervals, NULL points), idempotence, and the
  * width-unset opt-out. Each test uses a fresh child session so the
  * installed rule and width conf never leak into other suites. */
class RangeJoinRewriteSpec extends AnyFunSuite with SparkTestBase {

  private def freshSession() = {
    val s = spark.newSession()
    RangeJoinRewrite.install(s)
    s.conf.set(RangeJoinRewrite.WidthConf, "100")
    s
  }

  private def fixture(s: org.apache.spark.sql.SparkSession):
      (DataFrame, DataFrame) = {
    import s.implicits._
    // points at a bucket boundary (200), inside (57, 340), far (9999),
    // and NULL; intervals: normal, point-width, descending (empty),
    // NULL-bounded
    val points = Seq[(Long, java.lang.Long)](
      (1L, 57L), (2L, 200L), (3L, 340L), (4L, 9999L), (5L, null))
      .toDF("pid", "t")
    val ivals = Seq[(Long, java.lang.Long, java.lang.Long)](
      (10L, 50L, 250L),     // covers 57, 200
      (11L, 200L, 200L),    // point interval: covers exactly 200
      (12L, 300L, 100L),    // descending: matches nothing
      (13L, null, 500L),    // NULL bound: matches nothing
      (14L, 320L, 360L))    // covers 340
      .toDF("iid", "lo", "hi")
    (points, ivals)
  }

  test("rewritten naive BETWEEN join: exact result parity, no nested loop") {
    val s = freshSession()
    val (points, ivals) = fixture(s)
    val joined = points.join(ivals, col("t") >= col("lo") && col("t") <= col("hi"))
    val rows = joined.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 14L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "nested loop survived the rewrite:\n" + plan)
    assert(plan.contains("__graft_bucket"), "bucket equi-join missing:\n" + plan)
  }

  test("strict bounds stay strict through the rewrite") {
    val s = freshSession()
    val (points, ivals) = fixture(s)
    val strict = points.join(ivals, col("t") > col("lo") && col("t") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 200 no longer matches the point interval [200,200] nor counts its
    // own bounds; 57 stays inside (50,250)
    assert(strict == Set((1L, 10L), (2L, 10L), (3L, 14L)))
  }

  test("width unset leaves the naive plan untouched (explicit opt-in)") {
    val s = spark.newSession()
    RangeJoinRewrite.install(s)
    val (points, ivals) = fixture(s)
    val joined = points.join(ivals, col("t") >= col("lo") && col("t") <= col("hi"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bucket"), "rule fired without a width:\n" + plan)
  }

  test("joins with an equi key are left alone (hash join needs no rescue)") {
    val s = freshSession()
    import s.implicits._
    val a = Seq((1L, 5L), (2L, 15L)).toDF("k", "t")
    val b = Seq((1L, 0L, 10L), (2L, 0L, 10L)).toDF("k2", "lo", "hi")
    val joined = a.join(b, col("k") === col("k2") &&
      col("t") >= col("lo") && col("t") <= col("hi"))
    assert(joined.select("k").as[Long].collect().toSeq == Seq(1L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bucket"),
      "rule fired on an already-equi join:\n" + plan)
  }

  test("rewrite is idempotent under the optimizer's fixed point") {
    val s = freshSession()
    val (points, ivals) = fixture(s)
    val joined = points.join(ivals, col("t") >= col("lo") && col("t") <= col("hi"))
    val optimized = joined.queryExecution.optimizedPlan
    // applying the rule again to the already-rewritten plan is a no-op
    assert(RangeJoinRewrite(optimized) fastEquals optimized,
      "second application changed the plan")
    // and exactly one bucket join was introduced
    val buckets = optimized.toString.linesIterator
      .count(_.contains("__graft_bucket_t"))
    assert(buckets >= 1)
  }

  test("wide intervals spanning many buckets keep exact results") {
    val s = freshSession()
    import s.implicits._
    // width 100, interval spans 10 buckets; every in-range point matches
    val points = (0L until 50L).map(i => (i, i * 20L)).toDF("pid", "t")
    val ivals = Seq((99L, 150L, 990L)).toDF("iid", "lo", "hi")
    val n = points.join(ivals, col("t") >= col("lo") && col("t") <= col("hi")).count()
    assert(n == (0L until 50L).count(i => i * 20 >= 150 && i * 20 <= 990))
  }
}
