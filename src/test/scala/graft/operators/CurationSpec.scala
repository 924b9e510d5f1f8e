package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs across the field to the river"),
    (2L, "the quick brown fox jumps over the lazy dog and runs across the field to the river"), // exact dup
    (3L, "the quick brown fox jumps over the lazy dog and runs across the field to a river bed"), // near dup
    (4L, "a completely different story about query engines and the way they optimize large scans"),
    (5L, "$$ 11 ## 22 %% 33"),              // junk → quality gate
    (6L, "too short"),                       // length gate
    (7L, "le chat est dans la maison et les enfants sont dans le jardin avec une grande joie") // fr
  ).toDF("doc_id", "text")

  test("curate applies gates then dedups; survivors annotated") {
    val kept = Curation.curate(corpus, "text", "doc_id",
      Curation.Config(minQuality = 0.5, minTokens = 5,
        allowedLangs = Set("en"), nearDupThreshold = 0.6))
    val ids = kept.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L)) // 2 exact-dup, 3 near-dup, 5 junk, 6 short, 7 fr
    assert(kept.columns.contains("quality") && kept.columns.contains("lang_pred"))
  }

  test("report accounts for every drop") {
    val rep = Curation.report(corpus, "text", "doc_id",
      Curation.Config(minQuality = 0.5, minTokens = 5,
        allowedLangs = Set("en"), nearDupThreshold = 0.6))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("input")._1 == 7)
    assert(rep("length_gate") == (6L, 1L))   // drops 6
    assert(rep("quality_gate") == (5L, 1L))  // drops 5
    assert(rep("lang_gate") == (4L, 1L))     // drops 7
    assert(rep("exact_dedup") == (3L, 1L))   // drops 2
    assert(rep("near_dedup") == (2L, 1L))    // drops 3
  }

  test("repetition gate drops boilerplate-heavy docs; report accounts for it") {
    val withSpam = corpus.unionByName(Seq(
      (8L, "buy now buy now buy now buy now buy now buy now buy now buy now")
    ).toDF("doc_id", "text"))
    val cfg = Curation.Config(minQuality = 0.0, minTokens = 5,
      maxDupGramFraction = 0.5, nearDupThreshold = 0.6)
    val kept = Curation.curate(withSpam, "text", "doc_id", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(8L), "repetitive spam must be gated")
    assert(kept.contains(4L))
    val rep = Curation.report(withSpam, "text", "doc_id", cfg)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("repetition_gate")._2 == 1L) // doc 8
    // annotate exposes the signal itself
    val frac = Curation.annotate(withSpam, "text")
      .filter($"doc_id" === 8L).select("dup_gram_frac").as[Double].head()
    assert(frac > 0.8, s"16-token 2-phrase loop should be near-total repetition, got $frac")
  }

  test("ivfTopK: self-hit at rank 1 and high recall vs brute force on clustered data") {
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(10)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for (c <- centers.indices; m <- 0 until 30) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
      ((c * 30 + m).toLong, v)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 30 === 0 && $"vec_id" < 150)
      .select($"vec_id".as("qid"), $"embedding")
    val ivf = Similarity.ivfTopK(corpus, queries, "embedding", "vec_id", "qid",
      k = 5, nCenters = 10, nProbe = 2)
    val self = ivf.filter($"qid" === $"id")
    assert(self.count() == 5 && self.filter($"rank" === 1).count() == 5)
    val exact = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", "qid", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val approx = ivf.select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }
}
