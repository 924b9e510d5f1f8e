package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed band join vs a brute-force reference; boundary inclusivity;
  * the plan must be an equi-join, never a nested loop. */
class RangeJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val (leftRows, rightRows) = {
    val rng = new scala.util.Random(11)
    val l = (0 until 250).map(i =>
      (i.toLong, rng.nextInt(6).toLong, rng.nextInt(10000).toLong))
    val r = (0 until 350).map(i =>
      (i.toLong, rng.nextInt(6).toLong, rng.nextInt(10000).toLong))
    (l, r)
  }
  private lazy val left = leftRows.toDF("lid", "lk", "lt")
  private lazy val right = rightRows.toDF("rid", "rk", "rt")

  private def reference(before: Long, after: Long): Set[(Long, Long)] =
    (for {
      (lid, lk, lt) <- leftRows
      (rid, rk, rt) <- rightRows
      if rk == lk && rt >= lt - before && rt <= lt + after
    } yield (lid, rid)).toSet

  private def run(before: Long, after: Long): Set[(Long, Long)] =
    RangeJoin.bandJoin(left, right, "lk", "rk", "lt", "rt", before, after)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet

  test("pairs match the brute-force reference (symmetric band)") {
    assert(run(600, 600) == reference(600, 600))
  }

  test("asymmetric band, including before=0") {
    assert(run(0, 900) == reference(0, 900))
    assert(run(1500, 100) == reference(1500, 100))
  }

  test("band edges are inclusive on both ends") {
    val l = Seq((1L, 1L, 1000L)).toDF("lid", "lk", "lt")
    val r = Seq((10L, 1L, 900L), (11L, 1L, 1100L), (12L, 1L, 899L),
      (13L, 1L, 1101L)).toDF("rid", "rk", "rt")
    val got = RangeJoin.bandJoin(l, r, "lk", "rk", "lt", "rt", 100, 100)
      .select($"rid").as[Long].collect().toSet
    assert(got == Set(10L, 11L), s"got $got")
  }

  test("each qualifying pair appears exactly once (no bucket double-count)") {
    val df = RangeJoin.bandJoin(left, right, "lk", "rk", "lt", "rt", 600, 600)
      .groupBy($"lid", $"rid").count().filter($"count" > 1)
    assert(df.isEmpty, "bucket expansion duplicated a pair")
  }

  test("plan: shuffled equi-join, never a nested loop or cartesian") {
    val plan = RangeJoin.bandJoin(left, right, "lk", "rk", "lt", "rt",
      600, 600).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"band join degenerated to a quadratic plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"),
      s"expected an equi-join on (key, bucket):\n$plan")
  }
}
