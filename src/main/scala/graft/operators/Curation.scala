package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data pipeline
  * actually runs — annotate → gate → exact-dedup → near-dedup — as one
  * lazy plan over the documents table, with per-gate drop accounting.
  *
  * Single-scan annotation (all signals are per-row expressions), then the
  * two dedup shuffles; at 100 TB the same plan holds with the corpus
  * partitioned by source/date and AQE sizing the shuffles.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      allowedLangs: Set[String] = Set.empty, // empty = all
      nearDupThreshold: Double = 0.85,
      shingleK: Int = 3)

  /** Annotate every document with the curation signals (no filtering).
    * The token array is materialized ONCE and every signal reads it —
    * the naive form re-tokenizes the text per signal (~7 regex passes/row). */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScoreStaged(col(textCol), col("__toks")))
      .withColumn("lang_pred", TextFunctions.langIdStaged(col(textCol), col("__toks")))
      .withColumn("fingerprint", TextFunctions.fingerprintStaged(col("__toks")))
      .drop("__toks")

  /** Full curation: returns the surviving rows (annotated) plus an audit
    * column `__gate` on the rejected view obtainable via [[report]]. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config()): DataFrame = {
    val annotated = annotate(docs, textCol)
    val gated = annotated
      .filter(col("n_tokens").between(cfg.minTokens, cfg.maxTokens))
      .filter(col("quality") >= cfg.minQuality)
      .filter(if (cfg.allowedLangs.isEmpty) lit(true)
              else col("lang_pred").isin(cfg.allowedLangs.toSeq: _*))
    val exactDeduped = Dedup.exactByKey(gated, col("fingerprint"), idCol)
    Dedup.minhashDedup(exactDeduped, textCol, idCol,
      k = cfg.shingleK, threshold = cfg.nearDupThreshold)
  }

  /** Per-gate drop accounting: one row per gate with kept/dropped counts —
    * the curation observability a 100 TB run needs (silent truncation is
    * a correctness bug at scale). */
  def report(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val annotated = annotate(docs, textCol).cache()
    // all gate counters in ONE pass (cumulative conditions), instead of
    // one Spark action per gate
    val lenOk = col("n_tokens").between(cfg.minTokens, cfg.maxTokens)
    val qOk = col("quality") >= cfg.minQuality
    val langOk = if (cfg.allowedLangs.isEmpty) lit(true)
                 else col("lang_pred").isin(cfg.allowedLangs.toSeq: _*)
    val gates = annotated.agg(
      count(lit(1)).as("total"),
      count(when(lenOk, 1)).as("nLen"),
      count(when(lenOk && qOk, 1)).as("nQ"),
      count(when(lenOk && qOk && langOk, 1)).as("nLang")).head()
    val (total, nLen, nQ, nLang) = (gates.getLong(0), gates.getLong(1),
      gates.getLong(2), gates.getLong(3))
    val afterLang = annotated.filter(lenOk && qOk && langOk)
    val afterExact = Dedup.exactByKey(afterLang, col("fingerprint"), idCol).cache()
    val nExact = afterExact.count()
    val nNear = Dedup.minhashDedup(afterExact, textCol, idCol,
      k = cfg.shingleK, threshold = cfg.nearDupThreshold).count()
    annotated.unpersist(); afterExact.unpersist()
    Seq(
      ("input", total, 0L),
      ("length_gate", nLen, total - nLen),
      ("quality_gate", nQ, nLen - nQ),
      ("lang_gate", nLang, nQ - nLang),
      ("exact_dedup", nExact, nLang - nExact),
      ("near_dedup", nNear, nExact - nNear)
    ).toDF("gate", "kept", "dropped")
  }
}
