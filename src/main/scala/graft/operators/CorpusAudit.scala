package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level audits — the "do my sources overlap?" questions a
  * training-mix owner asks before weighting them.
  *
  * [[sourceOverlap]] computes the pairwise Jaccard similarity of the
  * distinct-gram sets of every source pair. The naive formulation — a
  * gram-keyed SELF-JOIN of (source, gram) — explodes on common grams
  * (a gram shared by every source yields |S|² join rows PER GRAM and the
  * join's build side is corpus-sized). Here the inverted index
  * `gram → set(sources)` is aggregated first: the per-gram source set is
  * bounded by |sources| (dozens), so the pair explosion is
  * |grams| × |S_g|²/2 with tiny |S_g|, and every shuffle is gram- or
  * pair-keyed — never corpus-wide. This is the same
  * "aggregate-then-expand" shape the LSH band join uses.
  */
object CorpusAudit {

  /** Pairwise source overlap over a pre-gramized frame.
    *
    * @param grams (sourceCol, gramCol) rows — duplicates allowed, the
    *              operator reduces to DISTINCT sets; produce grams with
    *              whatever tokenization the caller wants (word n-grams,
    *              shingle hashes, URLs, ...)
    * @return (src_a, src_b, n_a, n_b, inter, jaccard) for src_a < src_b,
    *         jaccard = |A∩B| / (|A|+|B|-|A∩B|), 6-decimal rounded;
    *         pairs with zero intersection are included (jaccard 0) so the
    *         matrix is complete
    */
  def sourceOverlap(grams: DataFrame, sourceCol: String,
                    gramCol: String): DataFrame = {
    val sg = grams.select(col(sourceCol).as("__src"), col(gramCol).as("__g"))
      .distinct()
    val sizes = sg.groupBy(col("__src")).agg(count(lit(1)).as("__n"))

    // inverted index: per-gram source set (bounded by |sources|), then
    // ordered pairs exploded INSIDE the bounded set
    val inter = sg.groupBy(col("__g"))
      .agg(collect_set(col("__src")).as("__srcs"))
      .select(explode(col("__srcs")).as("src_a"), col("__srcs"))
      .select(col("src_a"), explode(col("__srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))

    // complete matrix: every source pair, zero-intersection included
    val a = sizes.select(col("__src").as("src_a"), col("__n").as("n_a"))
    val b = sizes.select(col("__src").as("src_b"), col("__n").as("n_b"))
    a.join(b, col("src_a") < col("src_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard",
        round(col("inter") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
  }

  /** Out-of-vocabulary rate against the corpus's own top-`vocabSize`
    * vocabulary — the cheap "is this document made of normal words?"
    * curation signal (CCNet-style, minus the LM).
    *
    * Scale shape: by default the tokenize+explode scan runs twice (once
    * under the vocabulary count, once under the probe join — the two
    * subplans have different exchanges, so ReuseExchange cannot share
    * them); pass `stageTokens = true` to materialize the token stream
    * once (localCheckpoint — executor storage, spill-backed) and feed
    * both consumers from it, the right trade when tokenization dominates
    * the scan. The vocabulary is `vocabSize` rows taken with TakeOrdered
    * (map-side bounded heaps, no global sort) and BROADCAST back against
    * the token stream — the corpus is never self-joined and never
    * shuffled corpus-wide. Ties at the boundary break deterministically
    * (count desc, token asc).
    *
    * @return (idCol, n_tokens, oov, oov_rate) — one row per document
    *         with at least one token; oov_rate 6-decimal rounded
    */
  def oovRate(docs: DataFrame, textCol: String, idCol: String,
              vocabSize: Int = 1000, stageTokens: Boolean = false): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks0 = docs
      .select(col(idCol), explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__t"))
    // lazy: materializes on the FIRST action over the returned frame (an
    // eager checkpoint would run the corpus-wide tokenize job at plan
    // time, even if the result is never executed)
    val toks = if (stageTokens) toks0.localCheckpoint(eager = false) else toks0
    val vocab = toks.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__t").asc)
      .limit(vocabSize)
      .select(col("__t"), lit(true).as("__in"))
    toks.join(broadcast(vocab), Seq("__t"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, 1)).as("oov"))
      .withColumn("oov_rate",
        round(col("oov") / col("n_tokens").cast("double"), 6))
  }

  /** Frequency vocabulary + token-id encoding — the corpus-side half of
    * tokenizer training: the top-`vocabSize` tokens by (count desc,
    * token asc — deterministic tie-break) become ids 1..N in rank
    * order, and every document encodes as its id sequence with 0 for
    * out-of-vocabulary.
    *
    * Two physical paths, switched on `vocabSize` vs `literalMapThreshold`:
    *
    *   - SMALL vocab (≤ threshold): the ranked vocabulary is collected
    *     (metadata-sized) and rebroadcast as a map literal — encoding is
    *     one scan-side `element_at` per token, no join, no extra shuffle.
    *   - LARGE vocab (> threshold): a real 32k–100k tokenizer vocabulary
    *     as a map LITERAL is a codegen/64KB-constant-pool blow-up, so the
    *     vocabulary never leaves the cluster: it stays a frame, ranks via
    *     one bounded `row_number` window (≤ vocabSize rows, one
    *     partition — metadata-sized by construction), and BROADCAST
    *     left-joins against the posexploded token stream; documents
    *     reassemble order-exactly via sort-by-position. One extra
    *     doc-keyed shuffle, bounded by corpus token count — the price of
    *     not compiling the vocabulary into the plan.
    *
    * @return (idCol, n_tok, ids_str) — ids space-joined for
    *         engine-portable comparison */
  def encodeTokenIds(docs: DataFrame, idCol: String, textCol: String,
                     vocabSize: Int, literalMapThreshold: Int = 1024): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val ranked = wordGrams(docs, textCol, n = 1, keep = Seq(col(idCol)))
      .groupBy(col("gram")).agg(count(lit(1)).as("__freq"))
      .orderBy(col("__freq").desc, col("gram").asc)
      .limit(vocabSize)
    if (vocabSize <= literalMapThreshold) {
      val vocab = ranked.select(col("gram")).collect().map(_.getString(0))
      val idMap = map(vocab.zipWithIndex.flatMap { case (t, i) =>
        Seq(lit(t), lit((i + 1).toLong)) }.toIndexedSeq: _*)
      docs
        .withColumn("__toks",
          graft.functions.Barrier.evalOnce(split(col(textCol), " ")))
        .select(col(idCol), size(col("__toks")).cast("long").as("n_tok"),
          array_join(transform(col("__toks"),
            t => coalesce(element_at(idMap, t), lit(0L)).cast("string")), " ")
            .as("ids_str"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__freq").desc, col("gram").asc)
      val vocabIds = ranked
        .select(col("gram").as("__t"),
          row_number().over(w).cast("long").as("__id"))
      val toks = docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__p", "__t")))
      toks.join(broadcast(vocabIds), Seq("__t"), "left")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tok"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("__p"),
                coalesce(col("__id"), lit(0L)).as("__id")))),
              e => e.getField("__id").cast("string")),
            " ").as("ids_str"))
    }
  }

  /** Word n-grams of `textCol` under a plain single-space split, for
    * callers without a staged gram column (the oracle-portable
    * tokenization). The token array is projected ONCE before the
    * transform — re-inlining `split` into each element_at re-splits the
    * text per element. */
  def wordGrams(docs: DataFrame, textCol: String, n: Int,
                keep: Seq[Column]): DataFrame = {
    require(n >= 1, "n must be positive")
    val mk = (0 until n).map(j => s"element_at(__w, i + $j)")
      .mkString("concat_ws(' ', ", ", ", ")")
    // `keep` exprs evaluate ONCE in the first projection; downstream the
    // results travel by name (re-applying a computed keep expr after its
    // inputs are projected away would fail resolution)
    docs.select(keep :+ split(col(textCol), " ").as("__w"): _*)
      .filter(size(col("__w")) >= n)
      .withColumn("gram", explode(expr(
        s"transform(sequence(1, size(__w) - ${n - 1}), i -> $mk)")))
      .drop("__w")
  }
}
