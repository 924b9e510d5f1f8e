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
      /** Gopher-style repetition gate: drop docs whose duplicate 3-gram
        * fraction exceeds this (1.0 = disabled; heavily-repetitive docs
        * are boilerplate/spam). */
      maxDupGramFraction: Double = 1.0,
      nearDupThreshold: Double = 0.85,
      shingleK: Int = 3)

  /** Annotate every document with the curation signals (no filtering).
    * The token array is materialized ONCE and every signal reads it —
    * the naive form re-tokenizes the text per signal (~7 regex passes/row). */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    annotateStaged(docs, textCol, shingleK = None)

  /** [[annotate]] that ALSO carries the hashed `shingleK`-shingle sets as
    * `__sh`, so the downstream near-dedup reuses the tokenize/shingle work
    * instead of re-deriving it from the text — the whole curation plan
    * tokenizes each document exactly once. */
  def annotateStaged(docs: DataFrame, textCol: String,
                     shingleK: Option[Int]): DataFrame = {
    // Signals are Barrier-pinned: [[curate]] filters on four of them, and
    // unpinned columns get re-inlined into one FilterExec predicate whose
    // codegen does no cross-predicate subexpression elimination — the
    // tokenize pass would re-run once per gate (the failure class the
    // round-10 gopherStats fix measured at ~15× per row). Pure-projection
    // consumers (report's observe metrics) are unaffected: the barrier
    // just pins a Project.
    val once = graft.functions.Barrier.evalOnce _
    val base = docs
      .withColumn("__toks", once(TextFunctions.tokens(col(textCol))))
      .withColumn("n_tokens", once(TextFunctions.tokenCount(col(textCol))))
      .withColumn("quality", once(TextFunctions.qualityScoreStaged(col(textCol), col("__toks"))))
      .withColumn("lang_pred", once(TextFunctions.langIdStaged(col(textCol), col("__toks"))))
      .withColumn("fingerprint", once(TextFunctions.fingerprintStaged(col("__toks"))))
      // one kernel evaluation behind the barrier — three consumers below
      .withColumn("__rep", graft.functions.Barrier.evalOnce(
        graft.functions.SketchExpressions.ngramRepStats(col("__toks"), 3)))
      .withColumn("dup_gram_frac",
        (try_element_at(col("__rep"), lit(1)) - try_element_at(col("__rep"), lit(2)))
          .cast("double") / try_element_at(col("__rep"), lit(1)).cast("double"))
      .drop("__rep")
    shingleK match {
      case Some(k) => base.withColumn("__sh",
        graft.functions.SketchExpressions.shingleHashes(col("__toks"), k))
        .drop("__toks")
      case None => base.drop("__toks")
    }
  }

  /** Full curation: returns the surviving rows (annotated) plus an audit
    * column `__gate` on the rejected view obtainable via [[report]]. */
  def curate(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config()): DataFrame = {
    val annotated = annotateStaged(docs, textCol, Some(cfg.shingleK))
    val gated = annotated
      .filter(col("n_tokens").between(cfg.minTokens, cfg.maxTokens))
      .filter(col("quality") >= cfg.minQuality)
      .filter(col("dup_gram_frac") <= cfg.maxDupGramFraction)
      .filter(if (cfg.allowedLangs.isEmpty) lit(true)
              else col("lang_pred").isin(cfg.allowedLangs.toSeq: _*))
    val exactDeduped = Dedup.exactByKey(gated, col("fingerprint"), idCol)
    Dedup.minhashDedupFromHashes(exactDeduped, "__sh", idCol,
      threshold = cfg.nearDupThreshold).drop("__sh")
  }

  /** Per-gate drop accounting: one row per gate with kept/dropped counts —
    * the curation observability a 100 TB run needs (silent truncation is
    * a correctness bug at scale). */
  def report(docs: DataFrame, textCol: String, idCol: String,
             cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lenOk = col("n_tokens").between(cfg.minTokens, cfg.maxTokens)
    val qOk = col("quality") >= cfg.minQuality
    val repOk = col("dup_gram_frac") <= cfg.maxDupGramFraction
    val langOk = if (cfg.allowedLangs.isEmpty) lit(true)
                 else col("lang_pred").isin(cfg.allowedLangs.toSeq: _*)
    val gateCond = lenOk && qOk && repOk && langOk
    // The whole report tokenizes each document EXACTLY ONCE: the gate
    // counters ride the annotate pass as observe() metrics (collected
    // during the one materializing action, no separate aggregation job),
    // and that action checkpoints only the NARROW post-exact-dedup slice
    // (id + shingle hashes) that the band self-join then reads twice.
    // Round 2 instead cached the full annotated table (text + every signal
    // + shingles) AND checkpointed a second copy — the double wide
    // materialization was 6× the cost of the annotation itself.
    val obs = new org.apache.spark.sql.Observation()
    val annotated = annotateStaged(docs, textCol, Some(cfg.shingleK))
      .observe(obs,
        count(lit(1)).as("total"),
        count(when(lenOk, 1)).as("nLen"),
        count(when(lenOk && qOk, 1)).as("nQ"),
        count(when(lenOk && qOk && repOk, 1)).as("nRep"),
        count(when(gateCond, 1)).as("nLang"))
    // eager localCheckpoint = the single pass over the text; the exact-dedup
    // survivor count RIDES that same action as a second observe() (one row
    // survives per fingerprint, so the row count is the survivor count —
    // no separate count job, the checkpoint materialization tallies it)
    val obsExact = new org.apache.spark.sql.Observation()
    val afterExact = Dedup.exactByKey(
      annotated.filter(gateCond)
        .select(col(idCol), col("fingerprint"), col("__sh")),
      col("fingerprint"), idCol)
      .select(col(idCol), col("__sh"))
      .observe(obsExact, count(lit(1)).as("nExact"))
      .localCheckpoint()
    val gates = obs.get
    val (total, nLen, nQ, nRep, nLang) = (gates("total").asInstanceOf[Long],
      gates("nLen").asInstanceOf[Long], gates("nQ").asInstanceOf[Long],
      gates("nRep").asInstanceOf[Long], gates("nLang").asInstanceOf[Long])
    val nExact = obsExact.get("nExact").asInstanceOf[Long]
    val losers = Dedup.minhashLshPairsFromHashes(afterExact, "__sh", idCol,
        threshold = cfg.nearDupThreshold)
      .select(col("id_b")).distinct().count()
    val nNear = nExact - losers
    Seq(
      ("input", total, 0L),
      ("length_gate", nLen, total - nLen),
      ("quality_gate", nQ, nLen - nQ),
      ("repetition_gate", nRep, nQ - nRep),
      ("lang_gate", nLang, nRep - nLang),
      ("exact_dedup", nExact, nLang - nExact),
      ("near_dedup", nNear, nExact - nNear)
    ).toDF("gate", "kept", "dropped")
  }
}
