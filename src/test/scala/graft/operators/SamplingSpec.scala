package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic content-hash sampling: partition-independent membership,
  * rate accuracy, stratified rates. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0L until 4000L)
    .map(i => (i, s"document body number $i with filler $i", if (i % 4 == 0) "de" else "en"))
    .toDF("id", "text", "lang")

  test("membership is independent of partitioning and repeatable") {
    val a = Sampling.hashSample(docs.repartition(32), col("text"), 0.3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.coalesce(1), col("text"), 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on physical layout")
    assert(math.abs(a.size / 4000.0 - 0.3) < 0.05, s"rate off: ${a.size}")
  }

  test("rate 0 keeps nothing, rate 1 keeps everything, samples nest") {
    assert(Sampling.hashSample(docs, col("text"), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, col("text"), 1.0).count() == 4000)
    // a smaller rate is a SUBSET of a larger one (threshold ordering) —
    // growing the split never reshuffles previously selected rows
    val small = Sampling.hashSample(docs, col("text"), 0.1)
      .select("id").as[Long].collect().toSet
    val big = Sampling.hashSample(docs, col("text"), 0.4)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratified rates apply per stratum") {
    val out = Sampling.stratifiedHashSample(docs, col("text"), col("lang"),
        rates = Map("en" -> 0.2), defaultRate = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("de") == 1000L, "default rate 1.0 keeps the whole stratum")
    assert(math.abs(out("en") / 3000.0 - 0.2) < 0.05, s"en rate off: ${out("en")}")
  }
}
