package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the corpus-side other
  * half of the tokenizer surface next to [[CorpusAudit.encodeTokenIds]]
  * (vocabulary ranking) and the token-budget kernels.
  *
  * Classic BPE (Sennrich et al. 2016) over a word-frequency table: every
  * distinct word becomes a character sequence; each iteration counts
  * adjacent symbol pairs weighted by word frequency, merges the most
  * frequent pair (ties broken by pair text ascending — deterministic),
  * and rewrites the sequences. The merge TABLE is the trained artifact.
  *
  * Scale shape, per iteration:
  *   - the pair-count aggregation shuffles DISTINCT PAIRS only (symbol
  *     vocabulary², in practice ≪ corpus size) over the distinct-word
  *     frame — the corpus itself is read once, at the start, into the
  *     word-frequency table;
  *   - the argmax pulls ONE row to the driver (the IVF-centers pattern:
  *     the next plan needs the winning pair as a literal);
  *   - the rewrite is a scan-side literal `replace` on the spaced
  *     sequence string — no UDF, codegen'd — and the frame is
  *     localCheckpoint'ed so lineage doesn't deepen by K× replace
  *     chains (distinct words ≤ vocabulary size, executor-resident at
  *     any corpus scale).
  *
  * Merge application semantics are "leftmost non-overlapping, rescan to
  * fixpoint": ` a b ` → ` ab ` applied repeatedly until no occurrence
  * remains. On runs of a self-pair this can differ from reference BPE's
  * strict left-to-right single scan (e.g. six `a`s under merge (a,a):
  * fixpoint yields [aa, a, aa, a] where the strict scan yields
  * [aa, aa, aa]) — a deliberate variant, rare in natural text, chosen
  * because it is exactly expressible in any SQL engine (nested literal
  * `replace`), which keeps the whole loop oracle-checkable end to end.
  */
object Bpe {

  /** One trained merge: `pair` is the two space-separated symbols merged
    * at `step` (1-based), `freq` its weighted count at selection time. */
  final case class Merge(step: Long, pair: String, freq: Long)

  /** ` w o r d ` — the spaced, sentinel-padded symbol string both
    * engines rewrite with literal replace. */
  private def charSeq(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** Literal (non-regex) replace iterated `depth` times — fixpoint for
    * any sequence of ≤ 2·depth symbols (each pass consumes at least half
    * of the remaining shared-space occurrences). */
  private def nestedReplace(s: Column, from: Column, to: Column,
                            depth: Int): Column =
    (1 to depth).foldLeft(s)((c, _) => call_function("replace", c, from, to))

  /** Train `numMerges` BPE merges over the whitespace words of
    * `textCol`, weighted by occurrence. Returns (step, pair, freq) in
    * step order; stops early (fewer rows) if the corpus runs out of
    * adjacent pairs.
    *
    * @param replaceDepth fixpoint bound for one merge application —
    *        covers words up to 2·depth symbols; longer words still
    *        terminate, at worst with an unmerged tail occurrence */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            replaceDepth: Int = 16): DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__f"))
      .select(charSeq(col("__w")).as("__seq"), col("__f"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (step <- 1L to numMerges.toLong if !exhausted) {
      val best = words
        .select(col("__f"), split(trim(col("__seq")), " ").as("__t"))
        .filter(size(col("__t")) >= 2)
        .select(col("__f"), explode(expr(
          "transform(sequence(1, size(__t) - 1), " +
            "i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"))
          .as("__p"))
        .groupBy(col("__p")).agg(sum(col("__f")).as("__c"))
        .orderBy(col("__c").desc, col("__p").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val freq = best(0).getLong(1)
        val merged = pair.replace(" ", "")
        words = words
          .withColumn("__seq", nestedReplace(col("__seq"),
            lit(s" $pair "), lit(s" $merged "), replaceDepth))
          .localCheckpoint()
        merges += Merge(step, pair, freq)
      }
    }
    merges.toSeq.toDF("step", "pair", "freq")
  }

  /** The inference half: segment every distinct word of `textCol` under
    * the first `numMerges` trained merges (trained on the SAME corpus —
    * the gate shape; production would persist [[train]]'s table and fold
    * it here). The merge list is metadata-sized (one row per merge), so
    * application compiles to a single scan-side chain of literal
    * replaces over the distinct-word frame — no join, no extra shuffle
    * beyond the word distinct.
    *
    * @return (word, n_symbols, seq) — seq is the space-joined subword
    *         segmentation, one row per distinct word */
  def segment(docs: DataFrame, textCol: String, numMerges: Int,
              replaceDepth: Int = 16): DataFrame = {
    val mergeRows = train(docs, textCol, numMerges, replaceDepth)
      .orderBy(col("step")).collect()
    val words = docs
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(col("__w") =!= "").distinct()
    val finalSeq = mergeRows.foldLeft(charSeq(col("__w"))) { (c, r) =>
      val pair = r.getString(1)
      nestedReplace(c, lit(s" $pair "), lit(s" ${pair.replace(" ", "")} "),
        replaceDepth)
    }
    words.select(col("__w").as("word"), trim(finalSeq).as("seq"))
      .select(col("word"),
        size(split(col("seq"), " ")).cast("long").as("n_symbols"),
        col("seq"))
  }
}
