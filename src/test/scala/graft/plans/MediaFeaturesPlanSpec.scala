package graft.plans

import graft.SparkTestBase
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator decode plan: bit parity with the encoder-
  * path reference, null payloads, exec presence, and the property the
  * tier upgrade exists for — partitioning survives the operator, so a
  * downstream aggregation on the pre-decode key plans no new exchange. */
class MediaFeaturesPlanSpec extends AnyFunSuite with SparkTestBase {

  private def media(n: Int) = Multimodal.synthetic(spark, n)

  test("native decode plan matches the encoder-path reference bit for bit") {
    Seq(new Multimodal.DeterministicStubDecoder(8),
        new Multimodal.BmpPixelDecoder).foreach { dec =>
      val m = media(200)
      val native = Multimodal.withFeatures(m, dec)
        .select("media_id", "features")
      val reference = Multimodal.withFeaturesEncoderPath(m, dec)
        .select("media_id", "features")
      assert(native.exceptAll(reference).count() == 0 &&
        reference.exceptAll(native).count() == 0,
        s"parity failed for ${dec.getClass.getSimpleName}")
    }
  }

  test("null payloads yield null features; schema appends array<float>") {
    val out = Multimodal.withFeatures(media(100),
      new Multimodal.DeterministicStubDecoder(4))
    assert(out.schema.fields.last.name == "features")
    // synthetic nulls every 17th id
    val nulls = out.filter(col("payload").isNull)
    assert(nulls.count() > 0 &&
      nulls.filter(col("features").isNotNull).count() == 0)
    assert(out.filter(col("payload").isNotNull)
      .filter(size(col("features")) =!= 4).count() == 0)
  }

  test("the custom exec appears in the physical plan") {
    val out = Multimodal.withFeatures(media(50),
      new Multimodal.DeterministicStubDecoder(4))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MediaFeatures"),
      "custom physical operator missing:\n" + plan)
  }

  test("partitioning survives the operator: groupBy after decode adds no exchange") {
    val pre = media(500).repartition(4, col("media_id"))
    val out = Multimodal.withFeatures(pre, new Multimodal.DeterministicStubDecoder(4))
      .groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val final_ = plan.split("== Initial Plan ==")(0)
    val exchanges = final_.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"decode must not hide partitioning (expected only the repartition's exchange, got $exchanges):\n" + plan)
    // and for contrast: the encoder path DOES force a second exchange —
    // the cost this operator exists to remove
    val ref = Multimodal.withFeaturesEncoderPath(pre,
      new Multimodal.DeterministicStubDecoder(4))
      .groupBy(col("media_id")).agg(count(lit(1)).as("n"))
    ref.collect()
    val refPlan = ref.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val refExchanges = refPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(refExchanges >= 2, "encoder path unexpectedly preserved partitioning")
  }
}
