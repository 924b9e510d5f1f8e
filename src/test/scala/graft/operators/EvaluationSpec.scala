package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EvaluationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def log2d(x: Double): Double = math.log(x) / math.log(2.0)

  test("rankMetrics: hand-computed MRR/NDCG/P/R on a tiny ranking") {
    // query 1: items scored 9,8,7,6 -> positions 1..4; relevant at 2 and 4
    // query 2: one irrelevant item; query 3: relevant at position 1
    val df = Seq(
      (1L, 10L, false, 9.0), (1L, 11L, true, 8.0),
      (1L, 12L, false, 7.0), (1L, 13L, true, 6.0),
      (2L, 20L, false, 5.0),
      (3L, 30L, true, 5.0))
      .toDF("q", "item", "rel", "score")
    val out = Evaluation.rankMetrics(df, "q", "item", "rel",
        order = Seq($"score".desc), k = 3)
      .orderBy($"q")
      .select("q", "n_rel", "mrr", "ndcg_at_k", "precision_at_k", "recall_at_k")
      .as[(Long, Long, Double, Double, Double, Double)].collect()

    // q1: first relevant at pos 2 -> mrr 1/2; top-3 holds 1 relevant (pos 2)
    // dcg = 1/log2(3); idcg for min(n_rel=2, k=3)=2 ideal hits = 1/log2(2)+1/log2(3)
    val dcg1 = 1.0 / log2d(3.0)
    val idcg2 = 1.0 / log2d(2.0) + 1.0 / log2d(3.0)
    assert(out(0) == ((1L, 2L, 0.5,
      math.rint(dcg1 / idcg2 * 1e6) / 1e6, math.rint(1.0 / 3.0 * 1e6) / 1e6, 0.5)))
    // q2: nothing relevant -> all zeros, never null/NaN
    assert(out(1) == ((2L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // q3: single relevant at pos 1 -> perfect scores
    assert(out(2) == ((3L, 1L, 1.0, 1.0, math.rint(1.0 / 3.0 * 1e6) / 1e6, 1.0)))
  }

  test("rankMetrics: item id breaks score ties deterministically") {
    // equal scores: the smaller item id must rank first on every run
    val df = Seq((1L, 5L, true, 1.0), (1L, 4L, false, 1.0))
      .toDF("q", "item", "rel", "score")
    val mrr = Evaluation.rankMetrics(df, "q", "item", "rel",
        Seq($"score".desc), k = 2)
      .select("mrr").as[Double].head()
    assert(mrr == 0.5, "item 4 (irrelevant) must win the tie at position 1")
  }

  test("cohenKappa: hand-computed cells and chance correction") {
    // 10 rows: both-pos 4, a-only 1, b-only 2, both-neg 3
    val df = (Seq.fill(4)((true, true)) ++ Seq.fill(1)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false)))
      .toDF("a", "b")
    val r = Evaluation.cohenKappa(df, $"a", $"b")
      .select("n", "both_pos", "a_only", "b_only", "both_neg", "po", "pe", "kappa")
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 == 10 && r._2 == 4 && r._3 == 1 && r._4 == 2 && r._5 == 3)
    val po = 7.0 / 10.0
    val pe = (5.0 * 6.0 + 5.0 * 4.0) / 100.0
    assert(r._6 == math.rint(po * 1e6) / 1e6)
    assert(r._7 == math.rint(pe * 1e6) / 1e6)
    assert(r._8 == math.rint((po - pe) / (1.0 - pe) * 1e6) / 1e6)
  }

  test("cohenKappa: constant identical labelers report kappa 0, not 0/0") {
    val df = Seq.fill(5)((true, true)).toDF("a", "b")
    val r = Evaluation.cohenKappa(df, $"a", $"b")
      .select("po", "pe", "kappa").as[(Double, Double, Double)].head()
    assert(r == ((1.0, 1.0, 0.0)))
  }

  test("aucRoc: hand-computed tie-corrected AUC") {
    // pairs: pos@2 beats neg@1 (1), ties neg@2 (0.5); pos@3 beats both
    // negs (2) -> AUC = 3.5/4 = 0.875
    val df = Seq((1L, false), (2L, true), (2L, false), (3L, true))
      .toDF("s", "y")
    val r = Evaluation.aucRoc(df, $"s", $"y")
      .select("n", "n_pos", "n_neg", "auc", "gini")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r == ((4L, 2L, 2L, 0.875, 0.75)))
  }

  test("aucRoc: perfect / inverted / degenerate rankings") {
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    assert(Evaluation.aucRoc(perfect, $"s", $"y")
      .select("auc").as[Double].head() == 1.0)
    val inverted = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("s", "y")
    assert(Evaluation.aucRoc(inverted, $"s", $"y")
      .select("auc").as[Double].head() == 0.0)
    // no negatives: AUC is unmeasurable -> 0.5 by convention, never NaN
    val onlyPos = Seq((1L, true), (2L, true)).toDF("s", "y")
    val d = Evaluation.aucRoc(onlyPos, $"s", $"y")
      .select("auc", "gini").as[(Double, Double)].head()
    assert(d == ((0.5, 0.0)))
    // empty frame: zero counts and the 0.5 convention, no nulls
    val empty = Seq.empty[(Long, Boolean)].toDF("s", "y")
    val e = Evaluation.aucRoc(empty, $"s", $"y")
      .select("n", "n_pos", "n_neg", "auc")
      .as[(Long, Long, Long, Double)].head()
    assert(e == ((0L, 0L, 0L, 0.5)))
  }

  test("aucRoc is invariant under monotone score transforms") {
    val df = Seq((10L, false), (20L, true), (30L, false), (40L, true),
      (50L, true)).toDF("s", "y")
    val base = Evaluation.aucRoc(df, $"s", $"y").select("auc").as[Double].head()
    val scaled = Evaluation.aucRoc(df, $"s" * 7L + 3L, $"y")
      .select("auc").as[Double].head()
    assert(base == scaled)
  }

  test("aucRocBy: per-group AUC with a degenerate group") {
    // group "a" = the 0.875 hand-computed example; group "b" all-positive
    val df = Seq(("a", 1L, false), ("a", 2L, true), ("a", 2L, false),
      ("a", 3L, true), ("b", 9L, true), ("b", 7L, true))
      .toDF("g", "s", "y")
    val out = Evaluation.aucRocBy(df, $"g", $"s", $"y").orderBy($"grp")
      .select("grp", "n", "n_pos", "n_neg", "auc", "gini")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out(0) == (("a", 4L, 2L, 2L, 0.875, 0.75)))
    assert(out(1) == (("b", 2L, 2L, 0L, 0.5, 0.0)))
  }

  test("aucRocBy agrees with aucRoc run per group") {
    val df = Seq(("x", 10L, false), ("x", 20L, true), ("x", 30L, false),
      ("x", 40L, true), ("y", 1L, true), ("y", 2L, false), ("y", 2L, true))
      .toDF("g", "s", "y")
    val grouped = Evaluation.aucRocBy(df, $"g", $"s", $"y")
      .select("grp", "auc").as[(String, Double)].collect().toMap
    Seq("x", "y").foreach { g =>
      val solo = Evaluation.aucRoc(df.filter($"g" === g), $"s", $"y")
        .select("auc").as[Double].head()
      assert(grouped(g) == solo, s"group $g diverges from the global op")
    }
  }

  test("aucRoc plans without a single-reducer window") {
    val df = Seq((1L, false), (2L, true)).toDF("s", "y")
    val phys = Evaluation.aucRoc(df, $"s", $"y")
      .queryExecution.executedPlan
    val windows = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty,
      "negatives-below must come from the two-pass prefix sum, not a window")
  }

  test("calibration: hand-computed bins, cents=100 lands in the top decile") {
    val df = Seq((5L, false), (15L, true), (15L, false), (100L, true))
      .toDF("c", "y")
    val out = Evaluation.calibration(df, $"c", $"y").orderBy($"bin")
      .select("bin", "n", "n_pos", "mean_pred", "frac_pos", "brier")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(out(0) == ((0L, 1L, 0L, 0.05, 0.0, 0.0025)))
    // bin 1: preds 0.15/0.15, outcomes 1/0 ->
    // brier = ((15-100)^2 + 15^2) / 20000 = 0.3725
    assert(out(1) == ((1L, 2L, 1L, 0.15, 0.5, 0.3725)))
    // cents=100 must not open an 11th bin
    assert(out(2) == ((9L, 1L, 1L, 1.0, 1.0, 0.0)))
    assert(out.length == 3)
  }
}
