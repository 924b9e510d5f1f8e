package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): join two string sets on
  * approximate equality — the record-linkage pass a training pipeline
  * runs to collapse near-identical titles, author names, or product
  * strings that exact dedup can't see and shingle-Jaccard overkills
  * (single-character typos barely move a shingle set).
  *
  * The scale problem is the all-pairs Levenshtein: O(|L|·|R|) edit
  * distances is a non-starter. Standard blocking bounds it:
  *   1. candidates must share a BLOCK KEY (default: first token — a
  *      typo in one token leaves every other token intact, so any
  *      single-edit corruption beyond token 1 stays in its block),
  *      making the pair generation a plain hash equi-join;
  *   2. a LENGTH BAND (|len(l) − len(r)| ≤ maxDist — an edit changes
  *      length by at most 1) prunes scan-side before any distance;
  *   3. only survivors pay the Levenshtein verify, and the O(n·m) DP
  *      runs on short strings inside codegen.
  * Quadratic cost is confined to single blocks; a pathological hot
  * block (every row sharing one first token) is the same hot-key story
  * as every self-join here — cap it upstream or salt via [[Skew]].
  *
  * Both the block key and the verify are engine-portable (split_part /
  * levenshtein exist with identical semantics in DuckDB), so the whole
  * operator is oracle-checkable — blocking RECALL included: a planted
  * corruption whose match the blocking scheme loses is visible as a
  * missing output row on both sides.
  */
object Linkage {

  /** Default block key: the first whitespace-delimited token. */
  def firstToken(c: Column): Column = substring_index(c, " ", 1)

  /** Fuzzy pairs (left_val, right_val, dist) with dist ≤ maxDist,
    * deduplicated to distinct value pairs. Self-pairs (identical
    * strings from both sides) are kept when `keepExact`; dropped
    * otherwise (the usual ER setting — exact equality is [[Dedup]]'s
    * job). */
  def fuzzyJoin(left: DataFrame, leftCol: String,
                right: DataFrame, rightCol: String,
                maxDist: Int = 2,
                blockKey: Column => Column = firstToken,
                keepExact: Boolean = false): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val l = left.select(col(leftCol).cast("string").as("left_val")).distinct()
      .withColumn("__bk", blockKey(col("left_val")))
      .withColumn("__ll", length(col("left_val")))
    val r = right.select(col(rightCol).cast("string").as("right_val")).distinct()
      .withColumn("__bk", blockKey(col("right_val")))
      .withColumn("__rl", length(col("right_val")))
    val banded = l.join(r, Seq("__bk"))
      .filter(abs(col("__ll") - col("__rl")) <= maxDist)
    val scored = banded
      .withColumn("dist", levenshtein(col("left_val"), col("right_val")))
      .filter(col("dist") <= maxDist)
    (if (keepExact) scored else scored.filter(col("dist") > 0))
      .select(col("left_val"), col("right_val"), col("dist").cast("long").as("dist"))
  }
}
