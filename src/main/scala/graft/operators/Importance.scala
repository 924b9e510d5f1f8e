package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * each document by the log-likelihood ratio of its hashed n-gram buckets
  * under a TARGET-corpus bag-of-grams LM versus the BACKGROUND (full)
  * corpus LM. High scores mark background documents that look like the
  * target distribution — the standard recipe for up-weighting quality
  * domains when curating a 100 TB crawl toward a curated target.
  *
  * Scale shape (the reason hashed BUCKETS exist at all): the vocabulary
  * is folded into `buckets` hash cells, so the "language model" is a
  * `buckets`-row table regardless of corpus size. The plan is
  *   one gram-explode scan
  *   → one `buckets`-row aggregation (map-side partial, broadcast back)
  *   → one per-document aggregation,
  * i.e. two shuffles total, the first bounded by `buckets`, the second by
  * |docs|. Nothing driver-side except the 2-value totals row.
  *
  * Determinism: grams hash through the md5 draw shared by every operator
  * in this package ([[Sampling]]), so scores are partition- and
  * engine-independent (the oracle reproduces them in DuckDB bit-for-bit
  * after 6-decimal rounding — same contract as BM25).
  */
object Importance {

  /** CCNet-style perplexity quality filter (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * per-document cross-entropy under a unigram LM trained on a REFERENCE
    * slice of the corpus. CCNet scores crawl paragraphs with a
    * Wikipedia-trained KenLM and cuts head/middle/tail on the score; the
    * Spark-native analog trains the LM as one hashed-bucket aggregation
    * over the reference predicate — low cross-entropy ≈ looks like the
    * reference domain. Complements [[dsirWeights]]: DSIR RANKS documents
    * by target-vs-background likelihood ratio for importance resampling;
    * this scores absolute reference-likeness for threshold filtering.
    *
    * Same scale shape as DSIR: one token-explode scan → one `buckets`-row
    * LM aggregation (map-side partial, broadcast back) → one per-document
    * aggregation. Two shuffles, the first bounded by `buckets`.
    *
    * @param isRef reference-slice predicate (the "Wikipedia" stand-in)
    * @return (idCol, n_tok, ce) — add-one-smoothed cross-entropy in nats,
    *         rounded to 6 decimals (the BM25/DSIR libm-parity contract)
    */
  def unigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
                          isRef: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val toks = CorpusAudit.wordGrams(docs, textCol, n = 1,
        keep = Seq(col(idCol), isRef.as("__ref")))
      .withColumn("__b",
        conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % buckets)
      .select(col(idCol), col("__ref"), col("__b"))

    // `buckets`-row LM over the reference slice + 1-row total, broadcast;
    // built with conditional aggregation over the full token stream so
    // every bucket appearing in the corpus has a row (no join-miss case).
    // The total folds from the LM — an exact integer sum over the
    // `buckets`-row aggregate, NOT a second pass over the corpus (its
    // exchange is shared with the join side, so the token stream
    // materializes once for the LM and once for scoring)
    val lm = toks.groupBy(col("__b"))
      .agg(sum(when(col("__ref"), 1L).otherwise(0L)).as("__cnt"))
    val tot = lm.agg(sum(col("__cnt")).as("__t"))

    // mirrored parenthesis-for-parenthesis in the oracle: exact-integer
    // numerator over double denominator, one ln() per token, negated mean
    val term = log((col("__cnt") + lit(1L)) /
                   (col("__t").cast("double") + lit(buckets.toDouble)))
    toks
      .join(broadcast(lm), Seq("__b"))
      .join(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(-sum(term) / count(lit(1)), 6).as("ce"))
  }

  /** DSIR importance weights over word bigrams (plain single-space split —
    * the engine-portable tokenization the oracle mirrors with
    * `string_split(text, ' ')` + `lead()`).
    *
    * @param docs     corpus
    * @param isTarget predicate marking the TARGET slice (e.g. a curated
    *                 domain, `lang === "en"`); the background LM is the
    *                 whole corpus
    * @param buckets  hash-bucket count for the gram vocabulary
    * @return (idCol, n_grams, dsir) — mean per-gram log-likelihood ratio
    *         with add-one smoothing, rounded to 6 decimals; documents with
    *         fewer than 2 tokens carry no bigram and are excluded
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val grams = CorpusAudit.wordGrams(docs, textCol, n = 2,
        keep = Seq(col(idCol), isTarget.as("__tgt")))
      // the shared md5 draw: engine-portable, uniform over buckets
      .withColumn("__b",
        conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % buckets)
      .select(col(idCol), col("__tgt"), col("__b"))

    // `buckets`-row LM table + 1-row totals, both broadcast back; the
    // totals fold from the LM (exact integer sums over `buckets` rows),
    // not from a third pass over the gram stream
    val lm = grams.groupBy(col("__b")).agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"),
      count(lit(1)).as("__call"))
    val totals = lm.agg(
      sum(col("__ct")).as("__t_all"),
      sum(col("__call")).as("__n_all"))

    // mirrored parenthesis-for-parenthesis in the oracle: exact-integer
    // numerators over double denominators, two ln() per gram, mean per doc
    val term =
      log((col("__ct") + lit(1L)) /
          (col("__t_all").cast("double") + lit(buckets.toDouble))) -
      log((col("__call") + lit(1L)) /
          (col("__n_all").cast("double") + lit(buckets.toDouble)))
    grams
      .join(broadcast(lm), Seq("__b"))
      .join(broadcast(totals))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(term) / count(lit(1)), 6).as("dsir"))
  }
}
