package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hashed linear quality classifier: hand-computed scores, model-join vs
  * distilled-inline parity, zero-token exclusion, and the broadcast-join
  * plan shape of the production path. */
class QualityClassifierSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 4096
  private def model = QualityClassifier.syntheticModel(spark, dim)

  test("score matches the formula computed by hand") {
    val docs = Seq((1L, "alpha beta alpha")).toDF("id", "text")
    val got = QualityClassifier.scoreWithModel(docs, "text", "id", model, dim)
      .select($"id", $"n_tokens", $"edu_score", $"keep")
      .as[(Long, Long, Double, Boolean)].collect().toSeq

    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % dim
    }
    def w(b: Long): Long = (b * 37 + 11) % 2001 - 1000
    val milli = 2 * w(bucket("alpha")) + w(bucket("beta"))
    val s = milli.toDouble / (1000.0 * 3)
    val prob = BigDecimal(1.0 / (1.0 + math.exp(-s)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 3L, prob, milli >= 0)))
  }

  test("distilled inline path is identical to the model join") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = QualityClassifier.scoreWithModel(docs, "text", "doc_id", model, dim)
      .orderBy($"doc_id").collect().toSeq
    val b = QualityClassifier.scoreInline(docs, "text", "doc_id", dim)
      .orderBy($"doc_id").collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("a sparse (pruned) model scores missing buckets as weight 0") {
    val docs = Seq((1L, "alpha beta alpha")).toDF("id", "text")
    val empty = model.filter(lit(false)) // every bucket pruned away
    val got = QualityClassifier.scoreWithModel(docs, "text", "id", empty, dim)
      .select($"id", $"n_tokens", $"edu_score", $"keep")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    // all weights 0 → s = 0 → sigmoid 0.5; n_tokens still counts all 3
    assert(got == Seq((1L, 3L, 0.5, true)))
  }

  test("scoreMilli is scoreInline's exact-integer face (sigmoid round-trip)") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "one two"),
      (3L, "")).toDF("id", "text")
    val milli = QualityClassifier.scoreMilli(docs, "text", "id", dim = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val inline = QualityClassifier.scoreInline(docs, "text", "id", dim = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Number](1).longValue, r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(milli.keySet == Set(1L, 2L)) // zero-token doc excluded
    assert(milli.keySet == inline.keySet)
    milli.foreach { case (id, (n, m)) =>
      val (nI, edu, keep) = inline(id)
      assert(n == nI)
      assert(keep == (m >= 0))
      val expected = BigDecimal(
        1.0 / (1.0 + math.exp(-(m.toDouble / (1000.0 * n)))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(edu == expected, s"id=$id")
    }
  }

  test("zero-token documents are excluded, not scored as NaN") {
    val docs = Seq((1L, "real words"), (2L, "   "), (3L, "")).toDF("id", "text")
    val ids = QualityClassifier.scoreWithModel(docs, "text", "id", model, dim)
      .select($"id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }

  test("production path broadcasts the model and shuffles once") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = QualityClassifier.scoreWithModel(docs, "text", "doc_id", model, dim)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 1, s"expected one doc_id shuffle, got $shuffles:\n$p")
  }

  test("training separates a planted signal and is run-deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("y", array_contains(
        graft.functions.TextFunctions.tokens(col("text")), "join").cast("int"))
    val w1 = QualityClassifier.train(docs, "text", "doc_id", "y",
      dim = 256, iters = 3, lr = 500.0)
    val w2 = QualityClassifier.train(docs, "text", "doc_id", "y",
      dim = 256, iters = 3, lr = 500.0)
    assert(w1.orderBy($"bucket").collect().toSeq
      == w2.orderBy($"bucket").collect().toSeq, "training must be bit-stable")
    // score the corpus with the trained weights through the SAME loading
    // path a real model uses, and require class separation in-sample
    val scored = QualityClassifier.scoreWithModel(docs, "text", "doc_id",
        w1, dim = 256)
      .join(docs.select($"doc_id", $"y"), "doc_id")
    val means = scored.groupBy($"y").agg(avg($"edu_score").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(means(1) > means(0) + 0.04,
      s"3 GD rounds must separate the planted label: $means")
  }

  test("training refuses an all-empty corpus loudly") {
    val docs = Seq((1L, "  ", 0), (2L, "", 1)).toDF("id", "text", "y")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(docs, "text", "id", "y", 8, 1, 0.5)
    }
    assert(e.getMessage.contains("no documents"))
  }
}
