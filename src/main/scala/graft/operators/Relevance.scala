package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword relevance scoring over a document corpus.
  *
  * The standard Okapi BM25 formula with two engine-portability choices that
  * keep the score bit-reproducible across engines (the property every
  * deterministic curation decision in this library shares — see
  * [[Sampling]]):
  *
  *   - term frequency is exact substring occurrence count,
  *     `(len(text) - len(replace(text, term)))/len(term)` — pure integer
  *     string arithmetic any SQL engine evaluates identically (no
  *     tokenizer to keep in sync across engines);
  *   - document length is the corpus-provided `n_chars` (character
  *     normalization instead of token normalization).
  *
  * Plan shape: one corpus aggregation computes N, avg length, and each
  * term's document frequency in a single pass (every `df_t` is a
  * conditional count in the same Aggregate — no per-term scan). That
  * single stats row is broadcast-cross-joined back, so scoring is one scan
  * + one 1-row broadcast: no shuffle of the corpus at all. At 100 TB the
  * cost is exactly two corpus scans (stats + scoring), both
  * whole-stage-codegen'd; for repeated query batches the stats pass is
  * shared across all terms of all queries.
  */
object Relevance {

  /** Occurrences of `term` in `text` (exact substring count). */
  def termCount(text: Column, term: String): Column = {
    require(term.nonEmpty, "empty term")
    ((length(text) - length(replace(text, lit(term), lit("")))) / lit(term.length))
      .cast("int")
  }

  /** Per-document BM25 scores for `terms`, over documents with at least one
    * hit (the zero-score tail of a 100 TB corpus is never materialized).
    * Output: idCol, matched term count, score rounded to 6 dp.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, lenCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "no terms")
    val text = col(textCol)

    // One pass: N, avgdl, and every term's document frequency.
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(termCount(text, t) > 0, 1L).otherwise(0L)).as(s"__df_$i")
    }
    val aggs = count(lit(1)).as("__n") +:
      avg(col(lenCol).cast("double")).as("__avgdl") +: dfAggs
    val stats = docs.agg(aggs.head, aggs.tail: _*)

    val scored = docs.join(broadcast(stats))
    val perTerm = terms.zipWithIndex.map { case (t, i) =>
      val tf = termCount(text, t).cast("double")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - col(s"__df_$i") + lit(0.5)) /
          (col(s"__df_$i") + lit(0.5)))
      val norm = tf * (lit(k1) + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col(lenCol).cast("double") / col("__avgdl")))
      (idf * norm, tf > 0)
    }
    val score = perTerm.map(_._1).reduce(_ + _)
    val nMatched = perTerm.map { case (_, hit) =>
      when(hit, 1).otherwise(0) }.reduce(_ + _)

    scored
      .withColumn("n_terms", nMatched)
      .filter(col("n_terms") > 0)
      .select(col(idCol), col("n_terms"), round(score, 6).as("bm25"))
  }

  /** Reciprocal-Rank Fusion (Cormack et al., SIGIR'09) of several
    * bounded rank lists into one hybrid ranking — the standard way a
    * retrieval stack combines keyword (BM25) and dense (embedding-cosine)
    * candidates without score calibration: each system contributes
    * `1/(kRrf + rank)` for the documents it ranked, documents missing
    * from a list contribute nothing, and the fused order is by summed
    * contribution (ties broken by id ascending).
    *
    * Inputs are `(idCol, rankCol)` frames, each REQUIRED to be a bounded
    * top-N list (the contract of every ranking producer in this library —
    * [[Similarity.bruteForceTopKAgg]] ships ≤ k rows per query,
    * [[bm25]] feeds a TakeOrdered head). Fusion is therefore over at most
    * `systems × N` rows: the union + aggregate is trivially small at any
    * corpus scale, and the global `row_number` window over it is bounded
    * by construction — the 100 TB cost lives in the upstream rank
    * producers, which keep their own bounded-heap shapes.
    *
    * Output: (id, one `rank_i` per input system — null where that system
    * did not rank the doc — and `fused_rank`), all integers: the fused
    * ORDER uses the IEEE-double contribution sum (identical correctly-
    * rounded divisions in any engine), but only ranks are emitted, so
    * the result is hash-comparable across engines.
    */
  def rrf(rankings: Seq[(DataFrame, String)], idCol: String, rankCol: String,
          kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(kRrf >= 0, "kRrf must be non-negative")
    val tagged = rankings.map { case (df, name) =>
      df.select(col(idCol), col(rankCol).cast("long").as("__r"),
        lit(name).as("__sys"))
    }.reduce(_.unionByName(_))
    val perSystem = rankings.map { case (_, name) =>
      max(when(col("__sys") === name, col("__r"))).as(s"rank_$name")
    }
    val contribution =
      sum(lit(1.0) / (lit(kRrf.toDouble) + col("__r").cast("double")))
    val fused = tagged.groupBy(col(idCol))
      .agg(contribution.as("__rrf"), perSystem: _*)
    // global rank over the fused candidates: bounded input (systems × N
    // rows) by the top-N contract above, so the single-partition window
    // is a deliberate, size-safe choice — not a scale hazard.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rrf").desc, col(idCol).asc)
    fused.withColumn("fused_rank", row_number().over(w)).drop("__rrf")
  }
}
