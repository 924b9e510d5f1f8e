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

  test("mixture realizes per-source epoch weights deterministically") {
    val mixed = Mixing.mixture(docs, col("text"), col("lang"),
      weights = Map("en" -> 2.5), defaultEpochs = 1.0)
    val counts = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("de") == 1000L, "weight 1.0 = exactly one copy each")
    assert(math.abs(counts("en") / 3000.0 - 2.5) < 0.1, s"en epochs off: ${counts("en")}")
    // copies of the same doc carry distinct 1-based epoch tags
    val epochs = mixed.filter($"lang" === "en").groupBy("id")
      .agg(sort_array(collect_list("epoch")).as("es"))
    assert(epochs.filter(size($"es") === 3).count() > 0)
    assert(epochs.filter(!($"es" === array(lit(1), lit(2)) ||
      $"es" === array(lit(1), lit(2), lit(3)))).count() == 0)
    // rerun is bit-identical (no PRNG)
    val again = Mixing.mixture(docs, col("text"), col("lang"),
      weights = Map("en" -> 2.5), defaultEpochs = 1.0)
    assert(again.count() == mixed.count())
  }

  test("temperature mixing flattens source proportions while preserving total size") {
    // natural mix: en 3000 / de 1000
    val eps = Mixing.temperatureEpochs(Map("en" -> 3000L, "de" -> 1000L), alpha = 0.5)
    // alpha=0.5: q_en = sqrt(.75)/(sqrt(.75)+sqrt(.25)) ≈ .634, q_de ≈ .366
    assert(math.abs(eps("en") - 0.845) < 0.01, s"en epochs ${eps("en")}")
    assert(math.abs(eps("de") - 1.464) < 0.01, s"de epochs ${eps("de")}")
    // alpha=1 is the identity recipe
    val id = Mixing.temperatureEpochs(Map("en" -> 3000L, "de" -> 1000L), alpha = 1.0)
    assert(id("en") == 1.0 && id("de") == 1.0)
    val mixed = Mixing.temperatureMixture(docs, col("text"), col("lang"), alpha = 0.5)
    val counts = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // realized counts track q_i * N (hash-draw tolerance), total preserved
    assert(math.abs(counts("en") - 0.634 * 4000) < 120, s"en ${counts("en")}")
    assert(math.abs(counts("de") - 0.366 * 4000) < 120, s"de ${counts("de")}")
    assert(math.abs((counts("en") + counts("de")) - 4000L) < 200)
  }

  test("stratified rates apply per stratum") {
    val out = Sampling.stratifiedHashSample(docs, col("text"), col("lang"),
        rates = Map("en" -> 0.2), defaultRate = 1.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("de") == 1000L, "default rate 1.0 keeps the whole stratum")
    assert(math.abs(out("en") / 3000.0 - 0.2) < 0.05, s"en rate off: ${out("en")}")
  }

  private lazy val weighted = docs.withColumn("w",
    when(col("id") % 4 === 0, 50.0).otherwise(1.0))

  test("weighted sample: exactly k rows, independent of partitioning") {
    val a = Sampling.weightedPrioritySample(weighted.repartition(32),
        col("text"), col("w"), k = 200, tieBreak = col("id"))
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedPrioritySample(weighted.coalesce(1),
        col("text"), col("w"), k = 200, tieBreak = col("id"))
      .select("id").as[Long].collect().toSet
    assert(a.size == 200 && a == b)
  }

  test("weighted sample favors heavy rows per the E-S construction") {
    val sample = Sampling.weightedPrioritySample(weighted,
        col("text"), col("w"), k = 400, tieBreak = col("id"))
      .select("id").as[Long].collect()
    val heavy = sample.count(_ % 4 == 0)
    // 1000 heavy rows at weight 50 vs 3000 light at 1 — heavy rows should
    // dominate a 400-row sample overwhelmingly (E[heavy] ≈ 390+)
    assert(heavy > 340, s"only $heavy/400 heavy rows selected")
  }

  test("raising a selected row's weight never evicts it (priority monotone in w)") {
    val base = Sampling.weightedPrioritySample(weighted,
        col("text"), col("w"), k = 100, tieBreak = col("id"))
      .select("id").as[Long].collect().toSet
    val boosted = weighted.withColumn("w",
      when(col("id").isin(base.toSeq.take(20).map(Long.box): _*), col("w") * 100)
        .otherwise(col("w")))
    val again = Sampling.weightedPrioritySample(boosted,
        col("text"), col("w"), k = 100, tieBreak = col("id"))
      .select("id").as[Long].collect().toSet
    assert(base.take(20).subsetOf(again))
  }

  test("capPerGroup keeps at most n per group, the preferred rows, layout-independent") {
    val grouped = docs.withColumn("grp", (col("id") % 7).cast("string"))
      .withColumn("score", col("id") * 13 % 101)
    val capped = Sampling.capPerGroup(grouped, col("grp"), 50,
      Seq(col("score").desc, col("id").asc))
    val sizes = capped.groupBy("grp").count().select("count").as[Long].collect()
    assert(sizes.forall(_ == 50), s"quota violated: ${sizes.mkString(",")}")
    // kept = the 50 best by (score desc, id) in every group
    val want = grouped.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("score").desc, col("id").asc)))
      .filter(col("rk") <= 50).select("id").as[Long].collect().toSet
    assert(capped.select("id").as[Long].collect().toSet == want)
    // physical layout must not change the cut
    val b = Sampling.capPerGroup(grouped.repartition(32), col("grp"), 50,
      Seq(col("score").desc, col("id").asc)).select("id").as[Long].collect().toSet
    assert(b == want)
    // small groups pass through whole
    val tiny = Sampling.capPerGroup(grouped.filter(col("id") < 5), col("grp"),
      50, Seq(col("id").asc))
    assert(tiny.count() == 5)
  }

  test("hashSplitAssign: content-stable splits with the asked fractions") {
    val split = docs.withColumn("split",
      Sampling.hashSplitAssign(col("text"), Seq(("train", 0.8), ("val", 0.9)), "test"))
    val byName = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(byName("train") / 4000.0 - 0.8) < 0.03, byName.toString)
    assert(math.abs(byName("val") / 4000.0 - 0.1) < 0.02, byName.toString)
    assert(math.abs(byName("test") / 4000.0 - 0.1) < 0.02, byName.toString)
    // identical content → identical split, independent of row identity
    val dup = docs.withColumn("id", col("id") + 100000L)
    val joined = split.select(col("text"), col("split"))
      .join(dup.withColumn("split2",
          Sampling.hashSplitAssign(col("text"), Seq(("train", 0.8), ("val", 0.9)), "test"))
        .select(col("text"), col("split2")), Seq("text"))
    assert(joined.filter(col("split") =!= col("split2")).count() == 0)
    // malformed cuts rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplitAssign(col("text"), Seq(("a", 0.9), ("b", 0.5)), "c")
    }
  }

  test("equal weights reduce to top-k by the uniform draw") {
    val flat = docs.withColumn("w", lit(1.0))
    val got = Sampling.weightedPrioritySample(flat, col("text"), col("w"),
        k = 50, tieBreak = col("id"))
      .select("id").as[Long].collect().toSet
    // reference: priority = ln(u)/1 = ln(u), maximal ⇔ maximal u
    val ref = docs.withColumn("u",
        conv(substring(md5(col("text")), 1, 8), 16, 10).cast("double"))
      .orderBy(col("u").desc, col("id").asc).limit(50)
      .select("id").as[Long].collect().toSet
    assert(got == ref)
  }

  test("interleaveByWeight: weighted round-robin order, prefix proportions") {
    // source A weight 3, source B weight 1, 40 docs each
    val docs = ((1L to 40L).map(i => (i, "A")) ++
      (101L to 140L).map(i => (i, "B"))).toDF("doc_id", "source")
    val out = Mixing.interleaveByWeight(docs, "doc_id", "source",
        when(col("source") === "A", 3.0).otherwise(1.0))
      .orderBy(col("global_pos"))
      .select("source", "global_pos").as[(String, Long)].collect()
    // positions are 0-based, dense, gapless
    assert(out.map(_._2).toSeq == (0L until 80L))
    // every prefix of length 4k carries exactly 3k A's (stride scheduling
    // with w=3:1 emits A,A,B/A cycles: A@1/6, A@3/6=B@1/2 tie->A, ...)
    (1 to 10).foreach { k =>
      val prefix = out.take(4 * k)
      assert(prefix.count(_._1 == "A") == 3 * k,
        s"prefix ${4 * k}: ${prefix.count(_._1 == "A")} A's")
    }
    // zero/negative weights drop the source entirely
    val dropped = Mixing.interleaveByWeight(docs, "doc_id", "source",
        when(col("source") === "A", 2.0).otherwise(0.0))
      .select("source").distinct().as[String].collect().toSeq
    assert(dropped == Seq("A"))
  }
}
