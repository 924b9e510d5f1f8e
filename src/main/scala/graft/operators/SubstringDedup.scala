package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better") — find token runs of
  * length ≥ k repeated ACROSS documents and report the maximal spans to
  * remove from every non-owner copy.
  *
  * The paper builds a corpus-wide suffix array; the Spark-native
  * equivalent anchors on k-token grams: a repeated substring of length
  * L ≥ k contributes L−k+1 repeated k-gram starts, so the union of their
  * [p, p+k−1] windows reconstructs the full span exactly — no suffix
  * array, just one gram scan, one ownership aggregation, and a
  * gaps-and-islands window merge.
  *
  * Scale shape:
  *   - grams ship as 8-byte xxhash64 values, not 300-byte strings
  *     (`hashGrams=false` switches to exact text for collision-free
  *     runs; at 2^64 the collision term is negligible vs corpus size);
  *   - ownership (`min(doc_id)` per gram) is a partial-agg'd groupBy
  *     over DISTINCT (doc, gram) — bounded by distinct grams, never
  *     corpus-wide rows², and boilerplate grams (present in millions of
  *     docs) reduce map-side;
  *   - the span merge windows per document over MARKED positions only
  *     (duplicated-gram starts), typically a tiny fraction of tokens.
  *
  * Policy: the smallest doc_id containing a gram owns it; occurrences
  * in every other document are marked. Intra-document repetition is
  * [[Dedup.dedupLinesWithinDoc]]/[[Dedup.segmentDedup]]'s job and is
  * deliberately NOT marked here. Overlapping or adjacent marked windows
  * merge into one span.
  *
  * @return (idCol, span_start, span_end, span_tokens) — 0-based
  *         inclusive token positions of each maximal removable span
  */
object SubstringDedup {

  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               k: Int, hashGrams: Boolean = true): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val toks = docs
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__t"))
      .filter(size(col("__t")) >= k)
    val gramExpr =
      if (hashGrams) s"xxhash64(concat_ws(' ', slice(__t, i, $k)))"
      else s"concat_ws(' ', slice(__t, i, $k))"
    val grams = toks.select(col("__id"), explode(expr(
        s"transform(sequence(1, size(__t) - ${k - 1}), " +
          s"i -> struct(i - 1 AS p, $gramExpr AS g))")).as("__pg"))
      .select(col("__id"), col("__pg.p").as("__p"), col("__pg.g").as("__g"))
    // ownership over the distinct (doc, gram) set: min doc owns the gram
    val owners = grams.select(col("__id"), col("__g")).distinct()
      .groupBy(col("__g"))
      .agg(min(col("__id")).as("__owner"), count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2)
      .select(col("__g"), col("__owner"))
    val marked = grams.join(owners, Seq("__g"))
      .filter(col("__id") =!= col("__owner"))
      .select(col("__id"), col("__p")).distinct()
    // gaps-and-islands: merge overlapping-or-adjacent [p, p+k-1] windows
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
    marked
      .withColumn("__pm", max(col("__p") + (k - 1))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull || col("__p") > col("__pm") + 1, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(w))
      .groupBy(col("__id"), col("__sid"))
      .agg(min(col("__p")).cast("long").as("span_start"),
        (max(col("__p")) + (k - 1)).cast("long").as("span_end"))
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"))
  }

  /** Apply [[dupSpans]] output back to the corpus: drop every token
    * whose 0-based position falls inside one of the document's spans and
    * rejoin. Each document carries at most a handful of merged spans, so
    * the spans frame aggregates to one small array per affected doc, one
    * doc-keyed join ships it, and the drop itself is a scan-side
    * higher-order filter (codegen'd, no explode of the token stream).
    * Text is canonically single-space rejoined for EVERY document —
    * affected or not — so output text is uniformly normalized.
    *
    * @return (idCol, n_kept, text_scrub) for every input document;
    *         a fully-covered document yields n_kept 0, text "" */
  def removeSpans(docs: DataFrame, spans: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val sp = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    docs.join(sp, Seq(idCol), "left")
      .withColumn("__spans",
        coalesce(col("__spans"),
          array().cast("array<struct<span_start:long,span_end:long>>")))
      .withColumn("__kept", filter(split(col(textCol), " "), (t, i) =>
        !exists(col("__spans"), s =>
          i.cast("long") >= s.getField("span_start") &&
            i.cast("long") <= s.getField("span_end"))))
      .select(col(idCol), size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("text_scrub"))
  }
}
