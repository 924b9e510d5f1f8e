package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gopher rule filtering and the corpus OOV-rate signal. */
class QualityRulesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val fluent = ("the quick brown fox jumps over the lazy dog and " +
    "then runs back to the barn with plenty of energy to spare for more " +
    "laps around the yard before supper time arrives tonight ") * 2

  private def stats(texts: (Long, String)*) =
    QualityRules.gopherStats(texts.toSeq.toDF("id", "text"), "text",
        QualityRules.Thresholds(minWords = 20))
      .select("id", "n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
        "sw_hits", "bullet_frac", "ellipsis_frac", "keep")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("each rule independently fails its crafted document") {
    val m = stats(
      1L -> fluent,                                  // passes everything
      2L -> "too short to pass",                     // n_words
      3L -> (Seq.fill(30)("supercalifragilistic").mkString(" ") +
        " the of and to be that have with"),         // mean word len > 10
      4L -> (("# " * 25) + fluent.take(120)),        // symbol ratio
      5L -> (("12345 98765 " * 12) + "the of and"),  // alpha frac < 0.8
      6L -> ("lorem ipsum dolor sit amet " * 8),     // no probe stopwords
      7L -> (1 to 24).map(i => s"- bullet item $i").mkString("\n"), // bullets
      8L -> (1 to 24).map(i => s"this line trails off number $i ...").mkString("\n"))
    assert(m(1L).getBoolean(8), "fluent doc must pass")
    Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L).foreach(id =>
      assert(!m(id).getBoolean(8), s"doc $id must fail"))
    // spot-check the stats themselves
    assert(m(2L).getLong(1) == 4L)
    assert(m(5L).getDouble(4) < 0.8)
    assert(m(7L).getDouble(6) == 1.0)
    assert(m(8L).getDouble(7) == 1.0)
  }

  test("empty and whitespace docs have zeroed stats and fail") {
    val m = stats(1L -> "", 2L -> "   ")
    Seq(1L, 2L).foreach { id =>
      assert(m(id).getLong(1) == 0L)
      assert(m(id).getDouble(2) == 0.0)
      assert(!m(id).getBoolean(8))
    }
  }

  test("gopherFilter returns the original schema, survivors only") {
    val df = Seq((1L, fluent), (2L, "nope")).toDF("id", "text")
    val out = QualityRules.gopherFilter(df, "text")
    assert(out.columns.toSeq == Seq("id", "text"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("oovRate: rare tokens are OOV against the top-k vocabulary") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha"),
      (2L, "alpha beta gamma"),
      (3L, "zeta one"),
      (4L, "   ")).toDF("doc_id", "text")
    // corpus counts: alpha 4, beta 3, gamma 1, zeta 1, one 1
    // vocab (k=2, ties count desc then token asc) = {alpha, beta}
    val out = CorpusAudit.oovRate(docs, "text", "doc_id", vocabSize = 2)
      .orderBy("doc_id").collect()
    // the staged-token variant returns the identical result
    val staged = CorpusAudit.oovRate(docs, "text", "doc_id", vocabSize = 2,
        stageTokens = true)
      .orderBy("doc_id").collect()
    assert(staged.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
    // doc 4 has no tokens -> no row
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L) == (5L, 0L))
    assert(byId(2L) == (3L, 1L))
    assert(byId(3L) == (2L, 2L))
    assert(out.find(_.getLong(0) == 3L).get.getDouble(3) == 1.0)
  }

  test("oovRate plans a broadcast of the vocabulary, never a corpus self-join") {
    val docs = (1L to 200L).map(i => (i, s"tok$i common word stuff thing item"))
      .toDF("doc_id", "text")
    val out = CorpusAudit.oovRate(docs, "text", "doc_id", vocabSize = 5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "vocab probe must broadcast:\n" + plan)
    assert(plan.contains("TakeOrderedAndProject"),
      "vocabulary must be TakeOrdered (bounded heaps), not a global sort:\n" + plan)
  }

  test("oovRate stageTokens tokenizes ONCE: both consumers read the staged RDD") {
    val docs = (1L to 200L).map(i => (i, s"tok$i common word stuff thing item"))
      .toDF("doc_id", "text")
    def generates(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // resolve AQE final plan (and materialize the checkpoint)
      "Generate explode".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    }
    // default: the explode appears under BOTH the vocab count and the probe
    // (AQE prints initial+final plans, so the count doubles — assert ≥2)
    assert(generates(CorpusAudit.oovRate(docs, "text", "doc_id", 5)) >= 2)
    // staged: the explode lives inside the checkpointed lineage (runs once);
    // the SQL plan sees only the staged RDD scans — zero Generate nodes
    assert(generates(
      CorpusAudit.oovRate(docs, "text", "doc_id", 5, stageTokens = true)) == 0,
      "staged path must feed both consumers from the one materialized token stream")
  }

  test("c4LineClean keeps punctuated prose lines, drops boilerplate/code/short lines") {
    val doc =
      "The quick brown fox jumps over the dog.\n" + // kept
      "  Trailing-trim still counts as terminal!  \n" + // kept (trimmed)
      "Home | About | Contact\n" +                  // no terminal punct
      "Yes.\n" +                                    // punct but < 3 words
      "function f() { return 1; }\n" +              // banned '{'
      "Please enable JavaScript to continue.\n" +   // banned 'javascript'
      "Lorem ipsum dolor sit amet.\n" +             // banned 'lorem ipsum'
      "A second honest sentence ends here?"         // kept
    val r = QualityRules.c4LineClean(
        Seq((1L, doc), (2L, "no lines survive here")).toDF("id", "text"), "text")
      .select("id", "n_lines", "n_kept", "text_clean").collect()
    assert(r.length == 1 && r(0).getLong(0) == 1L, "doc 2 must be dropped entirely")
    assert(r(0).getLong(1) == 8L && r(0).getLong(2) == 3L, r(0).toString)
    val kept = r(0).getString(3).split("\n")
    assert(kept(0).endsWith("dog.") && kept(1).contains("terminal!")
      && kept(2).endsWith("here?"))
  }
}
