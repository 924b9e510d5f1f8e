package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("observeStatus counts ride the job itself (no second scan)") {
    val df = Seq(
      ("a", Some(true)), ("b", Some(true)), ("c", Some(false)),
      ("d", Option.empty[Boolean]), ("e", Option.empty[Boolean])
    ).toDF("id", "status")
    val (observed, obs) = Metrics.observeStatus(df)
    observed.write.format("noop").mode("overwrite").save() // one action
    val m = obs.get
    assert(m("processed") == 5L && m("succeeded") == 2L
      && m("failed") == 1L && m("pending") == 2L)
  }

  test("duration histogram matches the reference bucket shape") {
    val df = Seq(500.0, 1500.0, 1500.0, 9999.0, 20000.0).toDF("ms")
    val h = Metrics.durationHistogram(df, "ms").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h == Map(1 -> 1L, 2 -> 2L, 10 -> 1L, 11 -> 1L))
  }
}
