package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count–min sketch: the one-sided guarantee, mergeability across
  * partitionings, and the fixed deterministic hash family. */
class CountMinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  private def grid(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(CountMin.sketch(col("v"), depth, width))
      .collect()(0).getSeq[Long](0).toArray

  test("estimate never underestimates and is exact without collisions") {
    val df = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val g = grid(df.toDF("v"))
    assert(CountMin.estimate(g, depth, width, "a") >= 5L)
    assert(CountMin.estimate(g, depth, width, "b") >= 3L)
    assert(CountMin.estimate(g, depth, width, "c") >= 1L)
    // 3 distinct keys in a 4×64 grid: some row of the 4 is collision-free
    // with overwhelming certainty under the FIXED murmur3 family — and the
    // family is fixed, so this is a deterministic property of these keys,
    // not a flaky draw. Verify exactness (the min over rows hits it).
    assert(CountMin.estimate(g, depth, width, "a") == 5L)
    assert(CountMin.estimate(g, depth, width, "b") == 3L)
  }

  test("grid is partitioning-independent (merge is exact addition)") {
    val vals = (1 to 500).map(i => s"k${i % 37}")
    val one = grid(vals.toDF("v").coalesce(1))
    val many = grid(vals.toDF("v").repartition(13))
    assert(one.toSeq == many.toSeq)
    // row 0 of the grid sums to the non-null row count — the N the
    // audit's slack bound is computed from
    assert(one.slice(0, width).sum == 500L)
  }

  test("nulls are not counted") {
    val g = grid(Seq(Some("a"), None, Some("a"), None).toDF("v"))
    assert(g.slice(0, width).sum == 2L)
  }

  test("estimates are bounded by exact + eN additive slack") {
    // heavy collision pressure: 300 distinct keys into width 64
    val vals = (1 to 900).map(i => s"key-${i % 300}")
    val g = grid(vals.toDF("v"))
    val n = g.slice(0, width).sum
    val slack = math.ceil(math.E / width * n).toLong
    (0 until 300).foreach { k =>
      val exact = vals.count(_ == s"key-$k").toLong
      val est = CountMin.estimate(g, depth, width, s"key-$k")
      assert(est >= exact, s"key-$k underestimated: $est < $exact")
      assert(est <= exact + slack,
        s"key-$k above the eN bound: $est > $exact + $slack")
    }
  }

  test("non-string columns sketch under their string rendering") {
    // count_min over a LONG column used to ClassCastException at update
    // time; the child now casts to string, so a long sketches exactly as
    // its rendering — the same rendering estimate() queries with.
    val g = (Seq.fill(7)(42L) ++ Seq.fill(2)(7L)).toDF("v")
      .agg(CountMin.sketch(col("v"), depth, width))
      .collect()(0).getSeq[Long](0).toArray
    assert(CountMin.estimate(g, depth, width, "42") >= 7L)
    assert(CountMin.estimate(g, depth, width, "7") >= 2L)
    assert(g.slice(0, width).sum == 9L)
  }
}
