package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics for retrieval rankings and label quality — the
  * measurement side of a curation pipeline. Ranking a corpus (BM25 in
  * [[Relevance]], ANN in [[Similarity]]/[[Pq]]) or labeling it (the
  * classifier in [[QualityClassifier]], rule filters in [[QualityRules]])
  * is only half the loop; deciding whether the ranker/labeler is any good
  * closes it, and at 100 TB that judgment must itself be a distributed
  * query, not a notebook afterthought.
  *
  * Engine-portability: positions come from a deterministic total order
  * (caller-supplied score columns + the item id as final tiebreak), all
  * counts are exact integers, and only the final metric values touch
  * floating point, rounded to 6 dp — the same contract as
  * [[Relevance.bm25]] and the perplexity scorer, so a SQL oracle replays
  * every metric bit-for-bit.
  */
object Evaluation {

  /** Per-query ranking metrics over one (query, item, relevance) frame:
    * MRR, NDCG@k (binary gains), precision@k, recall@k.
    *
    * `order` defines the ranking (best first); the item id is appended as
    * the final tiebreak so positions are total and reproducible. Queries
    * with zero relevant items score 0 on every metric (never null/NaN —
    * a curation report must aggregate them, not skip them).
    *
    * Plan shape: one window partitioned BY QUERY (never a global sort —
    * rank positions shuffle once on the query key and each partition
    * sorts locally), one groupBy on the same key (the exchange is
    * reused), then a k-row broadcast join for the IDCG lookup: the ideal
    * DCG for m relevant items is a prefix sum of 1/log2(i+1), and
    * computing it via a tiny broadcast table keeps the per-query
    * aggregation a plain conditional sum instead of a second window.
    */
  def rankMetrics(df: DataFrame, queryCol: String, itemCol: String,
                  relCol: String, order: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    val w = Window.partitionBy(col(queryCol))
      .orderBy(order :+ col(itemCol).asc: _*)
    val ranked = df
      .withColumn("__pos", row_number().over(w))
      .select(col(queryCol), col(itemCol),
        col(relCol).cast("boolean").as("__rel"), col("__pos"))

    // discount(pos) = 1/log2(pos+1); binary gains make DCG a conditional
    // sum of discounts over the top k
    def discount(pos: Column): Column =
      lit(1.0) / log2(pos.cast("double") + lit(1.0))

    val perQuery = ranked.groupBy(col(queryCol))
      .agg(
        sum(when(col("__rel"), lit(1L)).otherwise(lit(0L))).as("__n_rel"),
        sum(when(col("__rel") && col("__pos") <= k, lit(1L)).otherwise(lit(0L)))
          .as("__rel_at_k"),
        sum(when(col("__rel") && col("__pos") <= k, discount(col("__pos")))
          .otherwise(lit(0.0))).as("__dcg"),
        min(when(col("__rel"), col("__pos"))).as("__first_rel"))

    // IDCG@k for m relevant items = Σ_{i=1..min(m,k)} 1/log2(i+1): a
    // k-row broadcast lookup of the prefix sums, built driver-side (k is
    // a query parameter, not data — no reason to run a window for it)
    import spark.implicits._
    val idcg = (1 to k).scanLeft(0.0) { (acc, i) =>
      acc + 1.0 / (math.log(i + 1.0) / math.log(2.0))
    }.tail.zipWithIndex.map { case (v, i) => (i + 1L, v) }
      .toDF("__m", "__idcg")
    perQuery
      .join(broadcast(idcg), least(col("__n_rel"), lit(k.toLong)) === col("__m"),
        "left")
      .select(
        col(queryCol),
        col("__n_rel").as("n_rel"),
        round(coalesce(lit(1.0) / col("__first_rel").cast("double"), lit(0.0)), 6)
          .as("mrr"),
        round(when(col("__n_rel") > 0, col("__dcg") / col("__idcg"))
          .otherwise(lit(0.0)), 6).as("ndcg_at_k"),
        round(col("__rel_at_k").cast("double") / lit(k.toDouble), 6)
          .as("precision_at_k"),
        round(when(col("__n_rel") > 0,
            col("__rel_at_k").cast("double") / col("__n_rel").cast("double"))
          .otherwise(lit(0.0)), 6).as("recall_at_k"))
  }

  /** ROC AUC of a score against a binary label, tie-corrected
    * (Mann–Whitney with midranks), computed from the distinct-score
    * histogram so the only ordered pass runs over score VALUES, not rows:
    * one map-side-combinable groupBy(score) collapses the corpus to its
    * score histogram, [[Ranking.withGlobalPrefixSum]] accumulates the
    * negatives seen below each score (two-pass ranking, so even a
    * surprisingly wide score domain never funnels through one reducer),
    * and the final reduce folds the exact integer numerator. The caller
    * quantizes the score (any monotone bucketing preserves AUC up to tie
    * granularity), so the histogram is bounded by score cardinality and
    * every stage stays embarrassingly parallel at any corpus size.
    *
    * Arithmetic is exact until the last division: with p_s/n_s the
    * positive/negative counts at score s and cnb_s the negatives at
    * strictly lower scores, 2·P·N·AUC = Σ_s p_s·(2·cnb_s + n_s) — a Long
    * fold that is exact while P·N < 2^62 (beyond that the final division
    * is the only lossy step anyway). Degenerate inputs (no positives or
    * no negatives) report AUC 0.5: no ranking is measurable, and a
    * curation report must aggregate the row, not drop it. Output: one row
    * (n, n_pos, n_neg, auc, gini), metrics rounded 6 dp.
    */
  def aucRoc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val hist = df.groupBy(score.as("__s"))
      .agg(
        sum(when(label.cast("boolean"), 1L).otherwise(0L)).as("__p"),
        sum(when(label.cast("boolean"), 0L).otherwise(1L)).as("__n"))
    // exclusive prefix of negatives below each score = inclusive global
    // prefix sum (two-pass, no single-reducer window) minus own count
    val contrib = Ranking
      .withGlobalPrefixSum(hist, "__cum_n", col("__n"), Seq(col("__s")))
      .withColumn("__cnb", col("__cum_n") - col("__n"))
      .agg(
        coalesce(sum(col("__p") + col("__n")), lit(0L)).as("n"),
        coalesce(sum(col("__p")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__n")), lit(0L)).as("n_neg"),
        coalesce(sum(col("__p") * (lit(2L) * col("__cnb") + col("__n"))),
          lit(0L)).as("__num"))
    val measurable = col("n_pos") > 0L && col("n_neg") > 0L
    val auc = when(measurable,
      col("__num").cast("double") /
        (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
      .otherwise(lit(0.5))
    contrib.select(col("n"), col("n_pos"), col("n_neg"),
      round(auc, 6).as("auc"),
      round(lit(2.0) * auc - lit(1.0), 6).as("gini"))
  }

  /** Per-group [[aucRoc]] — the sliced evaluation report (AUC per
    * language / source / time bucket) a curation pipeline runs to catch
    * a ranker that is good on average and broken on one slice. Same
    * exact-integer histogram construction, but the running negative
    * count comes from a window PARTITIONED by the group key over the
    * per-group score histogram: partitioned windows shuffle once on the
    * group key and sort locally, and the per-group aggregate that
    * follows reuses that exchange — two shuffles total, both bounded by
    * (groups × distinct scores), not rows. Groups with no positives or
    * no negatives report 0.5, same convention as [[aucRoc]].
    */
  def aucRocBy(df: DataFrame, group: Column, score: Column,
               label: Column): DataFrame = {
    val hist = df.groupBy(group.as("grp"), score.as("__s"))
      .agg(
        sum(when(label.cast("boolean"), 1L).otherwise(0L)).as("__p"),
        sum(when(label.cast("boolean"), 0L).otherwise(1L)).as("__n"))
    val w = Window.partitionBy(col("grp")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perGroup = hist
      .withColumn("__cnb", coalesce(sum(col("__n")).over(w), lit(0L)))
      .groupBy(col("grp"))
      .agg(
        sum(col("__p") + col("__n")).as("n"),
        sum(col("__p")).as("n_pos"),
        sum(col("__n")).as("n_neg"),
        sum(col("__p") * (lit(2L) * col("__cnb") + col("__n"))).as("__num"))
    val measurable = col("n_pos") > 0L && col("n_neg") > 0L
    val auc = when(measurable,
      col("__num").cast("double") /
        (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
      .otherwise(lit(0.5))
    perGroup.select(col("grp"), col("n"), col("n_pos"), col("n_neg"),
      round(auc, 6).as("auc"),
      round(lit(2.0) * auc - lit(1.0), 6).as("gini"))
  }

  /** Reliability diagram + per-bin Brier score for a calibrated
    * probability expressed in INTEGER basis points of 0.01 (0..100) —
    * the integer-unit trick the whole evaluation module uses: 0.01 is
    * not dyadic, so summing doubles would make the result depend on
    * partition fold order, while Σ cents and Σ (cents − 100·y)² are exact
    * Long folds with one division each at the end. One groupBy on the
    * decile bin (map-side combinable), no window, no second pass.
    *
    * Per bin: n, mean predicted probability (Σcents / 100n), empirical
    * positive rate, and the bin's Brier contribution
    * Σ(cents − 100·y)² / (10⁴·n) — mean squared error between the
    * forecast and the outcome, the standard decomposition target.
    * Metrics rounded 6 dp; bins with cents = 100 land in the top decile
    * (`least(c/10, 9)`), matching the usual right-closed final bin.
    */
  def calibration(df: DataFrame, pCents: Column, label: Column): DataFrame = {
    val c = pCents.cast("long")
    val y = when(label.cast("boolean"), 1L).otherwise(0L)
    df.select(least(c / 10L, lit(9L)).cast("long").as("bin"),
        c.as("__c"), y.as("__y"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__c")).as("__sum_c"),
        sum(col("__y")).as("n_pos"),
        sum((col("__c") - lit(100L) * col("__y")) *
            (col("__c") - lit(100L) * col("__y"))).as("__sq"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__sum_c").cast("double") /
          (lit(100.0) * col("n").cast("double")), 6).as("mean_pred"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"),
        round(col("__sq").cast("double") /
          (lit(10000.0) * col("n").cast("double")), 6).as("brier"))
  }

  /** Cohen's kappa between two binary labelers over one frame — the
    * chance-corrected agreement a labeling pipeline reports before
    * trusting either labeler ("92% raw agreement" means nothing when one
    * class dominates; kappa is what survives the base rate).
    *
    * One distributive aggregate (four conditional counts in a single
    * pass, no shuffle beyond the final 1-row reduce), then pure
    * arithmetic: po = (a+d)/n, pe = the chance agreement from the
    * marginals, kappa = (po-pe)/(1-pe). Degenerate case pe = 1 (both
    * labelers constant and identical) reports kappa 0 by convention
    * rather than 0/0. Output row: n, the four cells, po, pe, kappa
    * (rounded 6 dp).
    */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val a = labelA.cast("boolean")
    val b = labelB.cast("boolean")
    val counts = df.agg(
      count(lit(1)).as("n"),
      sum(when(a && b, 1L).otherwise(0L)).as("both_pos"),
      sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
      sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("both_neg"))
    val n = col("n").cast("double")
    val po = (col("both_pos") + col("both_neg")).cast("double") / n
    // marginals cast to double BEFORE multiplying: the products are
    // O(n²), which overflows Long around n ≈ 3e9 — trillion-row label
    // audits are exactly this operator's use case
    def m(x: Column, y: Column): Column = (x + y).cast("double")
    val pe = (m(col("both_pos"), col("a_only")) * m(col("both_pos"), col("b_only")) +
      m(col("b_only"), col("both_neg")) * m(col("a_only"), col("both_neg"))) / (n * n)
    counts.select(
      col("n"), col("both_pos"), col("a_only"), col("b_only"), col("both_neg"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round(when(pe === 1.0, lit(0.0)).otherwise((po - pe) / (lit(1.0) - pe)), 6)
        .as("kappa"))
  }
}
