package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style rule-based quality filtering (Rae et al. 2021 §A1.1, the
  * heuristics RefinedWeb/Dolma reuse): per-document surface statistics
  * with pass/fail thresholds. Everything is built-in column algebra over
  * one pass of the text — no UDFs, no higher-order functions (whose
  * CodegenFallback lambdas ran interpreted, a measured 3× on this
  * operator), no shuffle; the filter is a narrow whole-stage-codegen
  * per-row map a 1000-executor scan applies at read time. The hot
  * tokenize path goes through the compiled
  * [[graft.functions.SketchExpressions.Tokenize]] kernel.
  *
  * Stats (all engine-portable, mirrored exactly by the DuckDB oracle):
  *   - `n_words`         whitespace token count
  *   - `mean_word_len`   mean whitespace-token length
  *   - `symbol_ratio`    ("#" + "...") occurrences per word
  *   - `alpha_frac`      fraction of words containing an ASCII letter
  *   - `sw_hits`         distinct hits from a small stopword probe list
  *   - `bullet_frac`     fraction of lines starting with a bullet
  *   - `ellipsis_frac`   fraction of lines ending with an ellipsis
  */
object QualityRules {

  /** The Gopher probe stopwords (the paper uses exactly such a tiny
    * presence list — fluency evidence, not coverage). */
  val probeStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  final case class Thresholds(
      minWords: Long = 50, maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      minStopwordHits: Long = 2,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3)

  /** Substring occurrence count — `(len(s) - len(replace(s, t, ''))) /
    * len(t)`, the engine-portable formulation. */
  private def occurrences(c: Column, t: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(t), ""))) / t.length

  /** Append the stat columns plus a `keep` verdict.
    *
    * Every stat is whole-stage-codegen column algebra — no higher-order
    * functions (their lambdas are CodegenFallback and ran interpreted, a
    * measured 3× on this operator):
    *   - mean word length: total non-whitespace chars / word count
    *     (`regexp_replace(\s+ → "")` instead of an `aggregate` lambda);
    *   - alpha fraction: words MINUS letterless words, the latter via
    *     `regexp_count` with zero-width word boundaries (lookarounds are
    *     fine — this runs in the JVM regex engine, never the oracle's);
    *   - bullet / ellipsis line fractions: `(?md)` multiline regexp_count
    *     over the whole text instead of a filter over split lines (the
    *     `d` = UNIX_LINES keeps `^`/`$` on \n-only, matching the
    *     denominator and the oracle's RE2). */
  def gopherStats(df: DataFrame, textCol: String,
                  th: Thresholds = Thresholds()): DataFrame = {
    val text = col(textCol)
    // regex-trim, not trim(): trim strips only SPACES in both engines, so
    // a doc starting with "\n" would split into a phantom empty token
    val ws = TextFunctions.wsClass // RE2's \s, oracle-exact (no \x0B)
    val wst = TextFunctions.wsTrim(text)
    val nWords = when(length(wst) === 0, lit(0L))
      .otherwise(size(split(wst, ws + "+")).cast("long"))
    val sumWordLen = length(regexp_replace(wst, ws + "+", "")).cast("double")
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(sumWordLen / nWords.cast("double"))
    val symbols = (occurrences(text, "#") + occurrences(text, "...")).cast("double")
    val symbolRatio = when(nWords === 0, lit(0.0)).otherwise(symbols / nWords.cast("double"))
    val letterless = regexp_count(wst,
      lit(s"(?<=^|$ws)[^a-zA-Z \\t\\n\\f\\r]+(?=$$|$ws)"))
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise((nWords - letterless).cast("double") / nWords.cast("double"))
    val swHits = size(array_intersect(
      array(probeStopwords.map(lit): _*),
      TextFunctions.tokens(text))).cast("long")
    // (?d) = UNIX_LINES: only \n terminates a line for ^/$ — Java's
    // default MULTILINE terminator set (\r, \r\n, NEL U+0085,
    // LS U+2028, PS U+2029) would
    // disagree with the \n-split denominator AND the oracle's RE2
    // semantics on any non-LF line ending
    val nLines = size(split(text, "\n")).cast("double")
    val bulletFrac = regexp_count(text, lit("(?md)^ *[-*•]")).cast("double") / nLines
    val ellipsisFrac =
      regexp_count(text, lit("(?md)(\\.\\.\\.|…) *$")).cast("double") / nLines
    // Every stat is PINNED to this projection (Barrier.evalOnce):
    // without the fence, [[gopherFilter]]'s filter(keep) re-inlines all
    // seven stat trees into one FilterExec predicate, whose codegen does
    // no cross-predicate subexpression elimination — the whitespace-trim
    // regexp alone re-ran ~15× per row (measured 19.8 s → 3.7 s for the
    // sf1 curation pipeline's gopher stage; same failure class as the
    // round-3 q_json_array fix that introduced the barrier).
    val once = graft.functions.Barrier.evalOnce _
    df.withColumn("n_words", once(nWords))
      .withColumn("mean_word_len", once(meanLen))
      .withColumn("symbol_ratio", once(symbolRatio))
      .withColumn("alpha_frac", once(alphaFrac))
      .withColumn("sw_hits", once(swHits))
      .withColumn("bullet_frac", once(bulletFrac))
      .withColumn("ellipsis_frac", once(ellipsisFrac))
      .withColumn("keep",
        col("n_words").between(th.minWords, th.maxWords) &&
          col("mean_word_len").between(th.minMeanWordLen, th.maxMeanWordLen) &&
          col("symbol_ratio") <= th.maxSymbolRatio &&
          col("alpha_frac") >= th.minAlphaFrac &&
          col("sw_hits") >= th.minStopwordHits &&
          col("bullet_frac") <= th.maxBulletFrac &&
          col("ellipsis_frac") <= th.maxEllipsisFrac)
  }

  /** The cleaned corpus: rows passing every rule. */
  def gopherFilter(df: DataFrame, textCol: String,
                   th: Thresholds = Thresholds()): DataFrame =
    gopherStats(df, textCol, th).filter(col("keep"))
      .drop("n_words", "mean_word_len", "symbol_ratio", "alpha_frac",
        "sw_hits", "bullet_frac", "ellipsis_frac", "keep")

  /** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2 — the
    * complement of the document-level Gopher rules above): keep a line
    * only if, after whitespace trim, it (a) ends in terminal
    * punctuation (. ! ? ") — the rule that strips menus and nav
    * boilerplate, (b) has at least `minLineWords` words, and (c)
    * contains none of the paper's boilerplate/code tells ("lorem
    * ipsum", "{", "javascript"). Documents keeping fewer than
    * `minLines` lines are dropped entirely.
    *
    * Adds `n_lines`, `n_kept`, `text_clean`. Pure per-row array algebra
    * (split → filter → rejoin) behind one barrier-pinned line split —
    * no shuffle, no UDF, evaluated scan-side at any corpus size. */
  def c4LineClean(df: DataFrame, textCol: String,
                  minLineWords: Int = 3, minLines: Int = 1): DataFrame = {
    def keepLine(l: Column): Column = {
      // trim evaluated per use — value-identical, and the oracle mirrors
      // the same re-application
      def t = regexp_replace(l, "^[ \t\r]+|[ \t\r]+$", "")
      // \z, not $: Java's $ also matches before a trailing Unicode line
      // terminator (NEL/LS/PS) the [ \t\r] trim leaves in place — RE2's $
      // (the oracle) and the C4 rule mean absolute end-of-text
      t.rlike("[.!?\"]\\z") &&
        size(filter(split(t, " "), w => length(w) > lit(0))) >= minLineWords &&
        !lower(l).contains("lorem ipsum") &&
        !l.contains("{") &&
        !lower(l).contains("javascript")
    }
    df.withColumn("__lines",
        graft.functions.Barrier.evalOnce(split(col(textCol), "\n")))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("__kept", filter(col("__lines"), keepLine _))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("text_clean", array_join(col("__kept"), "\n"))
      .drop("__lines", "__kept")
      .filter(col("n_kept") >= minLines)
  }
}
