package graft.functions

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("topK aggregate == window row_number ranking, exactly") {
    val corpus = graft.Tables.embeddings(spark, sfDir)
    val queries = corpus.filter($"vec_id" < 6).select($"vec_id".as("qid"), $"embedding")
    val win = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", "qid", k = 7)
      .select("qid", "id", "cosine", "rank")
    val agg = Similarity.bruteForceTopKAgg(corpus, queries, "embedding", "vec_id", "qid", k = 7)
      .select("qid", "id", "cosine", "rank")
    assert(win.exceptAll(agg).count() == 0)
    assert(agg.exceptAll(win).count() == 0)
    assert(agg.count() == 6 * 7)
  }

  test("topK plan partially aggregates before the shuffle (no window sort)") {
    val corpus = graft.Tables.embeddings(spark, sfDir)
    val queries = corpus.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    val agg = Similarity.bruteForceTopKAgg(corpus, queries, "embedding", "vec_id", "qid", k = 5)
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"), plan)
    assert(!plan.contains("Window"), "still using a window:\n" + plan)
  }

  test("hardNegatives respects the cosine band and excludes self/near-dups") {
    // q = (1,0); a ~cos .995 (above band), b cos .707, d cos .447, c cos 0
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),          // self: cosine 1.0, out of band
      (1L, Array(0.995f, 0.0995f)),     // near-dup, above hiCos
      (2L, Array(1.0f, 1.0f)),          // cos ≈ .707 — in band
      (3L, Array(1.0f, 2.0f)),          // cos ≈ .447 — in band
      (4L, Array(0.0f, 1.0f)))          // cos 0 — below loCos
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding")
    val r = Similarity.hardNegatives(corpus, queries, "embedding", "vec_id", "qid",
        k = 5, loCos = 0.1, hiCos = 0.9)
      .select($"qid", $"id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(r == Set((0L, 2L, 1L), (0L, 3L, 2L)),
      s"expected in-band negatives ranked by cosine, got $r")
  }

  test("int8 quantization: reconstruction error bounded by scale/2, high recall vs exact") {
    val corpus = graft.Tables.embeddings(spark, sfDir)
    // exact rounding property: |x - code*scale| <= scale/2 per component
    val bad = Similarity.quantizeInt8(corpus, "embedding")
      .select($"embedding".cast("array<double>").as("e"), $"qscale",
        Similarity.dequantize($"qcodes", $"qscale").as("d"))
      .filter(exists(zip_with($"e", $"d", (x, y) => abs(x - y) > $"qscale" / 2 + 1e-12),
        identity))
      .count()
    assert(bad == 0, s"$bad vectors violate the scale/2 reconstruction bound")
    // recall@5: the quantized ranking must mostly agree with the exact one
    val queries = corpus.filter($"vec_id" < 10).select($"vec_id".as("qid"), $"embedding")
    val exact = Similarity.bruteForceTopKAgg(corpus, queries, "embedding", "vec_id", "qid", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizedTopK(corpus, queries, "embedding", "vec_id", "qid", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall@5 $recall below 0.8")
  }

  test("topK keeps k best with deterministic tie-break") {
    val df = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.9), // ties → smaller id first
      (1L, 13L, 0.5), (2L, 20L, 0.1)
    ).toDF("g", "id", "score")
    val r = df.groupBy($"g").agg(TopK.topK($"score", $"id", 2).as("top"))
      .select($"g", explode($"top").as("t"))
      .select($"g", $"t.id", $"t.rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(r == Set((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1)))
  }

  test("GraftExtensions injects SQL functions via withExtensions") {
    import org.apache.spark.sql.SparkSession
    val original = spark
    // getOrCreate returns the existing default session and IGNORES
    // extensions — clear it so a fresh session (sharing the context) is
    // built with the hook applied, then restore
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      assert(s2 ne original)
      val out = s2.sql("SELECT dot_product(array(1.0d,2.0d), array(3.0d,4.0d)) AS dp")
        .collect().head.getDouble(0)
      assert(out == 11.0)
      val sh = s2.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS s")
        .collect().head.getLong(0)
      assert(sh != 0L)
    } finally {
      SparkSession.setDefaultSession(original)
      SparkSession.setActiveSession(original)
    }
  }
}
