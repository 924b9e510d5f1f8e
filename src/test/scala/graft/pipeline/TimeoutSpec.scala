package graft.pipeline

import graft.SparkTestBase
import graft.util.Timeouts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeoutSpec extends AnyFunSuite with SparkTestBase {

  test("a stage exceeding its deadline is cancelled and surfaces a timeout") {
    // the sleep lives in a FILTER (count() prunes projections away) and
    // its argument references the column so Catalyst cannot constant-fold
    val slow = spark.range(200).repartition(8)
      .filter("java_method('java.lang.Thread', 'sleep', 100L + id * 0) IS NULL")
    intercept[Timeouts.StageTimeoutException] {
      Timeouts.withTimeout(spark, timeoutMs = 1500) { slow.count() }
    }
  }

  test("a stage within its deadline completes normally") {
    val n = Timeouts.withTimeout(spark, timeoutMs = 60000) {
      graft.Tables.nation(spark, sfDir).count()
    }
    assert(n == 25)
    // the session remains usable after the watchdog cleans up
    assert(graft.Tables.region(spark, sfDir).count() == 5)
  }

  test("withTimeout restores the caller's job group (nested/outer groups keep working)") {
    val sc = spark.sparkContext
    sc.setJobGroup("outer-app", "outer", interruptOnCancel = false)
    try {
      Timeouts.withTimeout(spark, timeoutMs = 60000) {
        spark.range(10).count()
      }
      // clearJobGroup here would detach later jobs from "outer-app",
      // silently breaking the caller's own cancelJobGroup
      assert(sc.getLocalProperty("spark.jobGroup.id") == "outer-app")
    } finally sc.clearJobGroup()
  }

  test("a finished stage's stale watchdog never cancels a later stage reusing the group") {
    // first invocation: generous deadline, returns quickly; its watchdog
    // thread is still sleeping when the second invocation starts the
    // SAME group name -- the armed gate (not just interrupt timing) must
    // keep it from cancelling the second stage's jobs
    Timeouts.withTimeout(spark, timeoutMs = 600, group = "reused-g") {
      spark.range(5).count()
    }
    Thread.sleep(700) // stale watchdog's deadline passes while stage 2 runs
    val out = Timeouts.withTimeout(spark, timeoutMs = 60000, group = "reused-g") {
      Thread.sleep(200)
      spark.range(5).count()
    }
    assert(out == 5L)
  }
}
