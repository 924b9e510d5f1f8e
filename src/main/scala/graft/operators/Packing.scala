package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing plan for pretraining batches: the
  * concatenate-then-chunk scheme (join the stream with separators, cut
  * fixed-capacity context windows). Each document is assigned the chunk
  * its first token lands in plus its offset inside that chunk — the full
  * packing layout as metadata, without materializing concatenated text.
  *
  * Scale shape: one partitioned window per stream (running token offset),
  * so streams pack in parallel and nothing is sequential beyond the
  * per-stream prefix sum — the plan a 1000-executor cluster wants. The
  * assignment is deterministic given (stream, order), so shards can be
  * re-derived from metadata alone.
  */
object Packing {

  /** Append `chunk` (0-based context-window index where the doc starts)
    * and `chunk_offset` (token offset inside that chunk). `capacity` is
    * the context length in the same unit as `sizeCol` (tokens, chars). */
  def concatChunks(df: DataFrame, stream: Column, order: Column,
                   sizeCol: Column, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(stream).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offset = coalesce(sum(sizeCol).over(w), lit(0L)).cast("long")
    df.withColumn("__off", offset)
      .withColumn("chunk", expr(s"__off div $capacity"))
      .withColumn("chunk_offset", pmod(col("__off"), lit(capacity)))
      .drop("__off")
  }

  /** Sliding-window document chunking (the RAG / long-doc pretrain
    * chunker): cut each document's token sequence into windows of
    * `maxTokens` advancing by `maxTokens - overlap`, so consecutive
    * chunks share `overlap` tokens. Emits one row per chunk with its
    * 0-based index, token count, and re-joined text. Pure per-row
    * expressions — explode over an integer sequence plus array slices,
    * no shuffle, engine-reproducible (the oracle mirrors it with list
    * slicing). A document shorter than one window yields exactly one
    * chunk; step arithmetic is integer end-to-end (no float ceil). */
  def chunkDocs(df: DataFrame, textCol: String, idCol: String,
                maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "0 <= overlap < maxTokens")
    val step = maxTokens - overlap
    // Word-chunking contract: splits on SINGLE SPACES — the input is
    // expected whitespace-normalized text (the curation pipeline's
    // canonical form), and chunk_text reconstruction must be the exact
    // inverse of the split, which a \s+ class split cannot be (it would
    // collapse newlines/tabs out of the reconstructed chunks). Multi-
    // whitespace input shifts boundaries, it never loses characters.
    // NULL-text documents emit NO chunk rows: unguarded, size(null)
    // propagates through greatest/least (which skip nulls) into one
    // fabricated chunk claiming a full maxTokens of null text.
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .withColumn("__n", size(col("__w")).cast("long"))
      // ceil((n - overlap) / step) in integers, min 1
      .withColumn("__nc",
        greatest(lit(1L), expr(s"(__n - $overlap + $step - 1) div $step")))
      .select(col(idCol), col("__w"), col("__n"),
        explode(expr("sequence(0, __nc - 1)")).as("chunk_idx"))
      .withColumn("chunk_tokens",
        least(lit(maxTokens.toLong), col("__n") - col("chunk_idx") * step))
      .withColumn("chunk_text", expr(
        s"array_join(slice(__w, cast(chunk_idx * $step + 1 as int), $maxTokens), ' ')"))
      .select(col(idCol), col("chunk_idx"), col("chunk_tokens"),
        col("chunk_text"))
  }

  /** Output-stage shard assignment: `rowsPerShard` consecutive rows of the
    * global (sortCols) order per shard — built on [[Ranking]]'s two-pass
    * global position, so no single-reducer numbering. At write time,
    * `repartition(col("shard")).write.partitionBy("shard")` gives one
    * directory per shard with its rows co-located. */
  def assignShards(df: DataFrame, sortCols: Seq[Column],
                   rowsPerShard: Long): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    Ranking.withGlobalPosition(df, "__pos", sortCols)
      .withColumn("shard", expr(s"__pos div $rowsPerShard"))
      .drop("__pos")
  }

  /** Token-BALANCED shard assignment: shards cut on a cumulative token
    * budget instead of a row count, so a shard of short tweets and a
    * shard of book chapters carry the same training cost — what the
    * trainer's data loader actually wants from its shards. A document is
    * never split: doc d lands in shard `floor(prefix_before(d) /
    * budget)` of the global (sortCols) order — `sum(tokens) OVER
    * (ORDER BY …)` semantics, computed by [[Ranking]]'s two-pass prefix
    * sum (per-partition subtotals to the driver; no single-reducer
    * window). Oversized documents (> budget tokens) get a shard of their
    * own and spill the boundary forward, exactly like the SQL window
    * formulation. Token counts are assumed NON-NEGATIVE (NULL counts as
    * zero); a negative value makes shard ids non-monotone, exactly as
    * the SQL window formulation would. */
  /** NOTE: `tokensCol`/`sortCols` must be NAME-based (`col("tokens")`),
    * not frame-resolved (`df("tokens")`): the two-pass prefix sum rebuilds
    * the plan from an RDD with fresh expression ids, so a pre-resolved
    * AttributeReference from the input frame no longer binds. */
  def assignShardsByTokenBudget(df: DataFrame, sortCols: Seq[Column],
                                tokensCol: Column, budget: Long,
                                numPartitions: Int = -1): DataFrame = {
    require(budget > 0, "budget must be positive")
    val v = coalesce(tokensCol.cast("long"), lit(0L))
    Ranking.withGlobalPrefixSum(df, "__cum", tokensCol, sortCols, numPartitions)
      .withColumn("__before", col("__cum") - v)
      .withColumn("shard", expr(s"__before div $budget"))
      .drop("__cum", "__before")
  }
}
