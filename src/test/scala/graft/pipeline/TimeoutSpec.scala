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
}
