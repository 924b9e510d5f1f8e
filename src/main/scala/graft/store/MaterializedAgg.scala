package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over the [[ChangeFeed]]: keep a
  * count/sum aggregate materialized across commits by folding in each
  * commit range's change feed instead of re-aggregating the table — at
  * 100 TB the difference between touching the rows that moved (a
  * status-flip commit: a few slices) and re-scanning everything.
  *
  * The algebra is the classic signed-delta form (insert and
  * update_postimage weigh +1, delete and update_preimage weigh −1), so
  * a key-moving update maintains BOTH groups correctly: the preimage
  * decrements its old group, the postimage increments the new one, and
  * a value-only update nets count 0 / sum (new − old). Sums run in
  * DECIMAL, so partial aggregation and merge order cannot drift a
  * cent — state stays bit-equal to a from-scratch recompute forever
  * (MaterializedAggSpec pins this through a mutation storm; the q_ivm
  * gate proves it against an independent engine's recompute).
  *
  * Scale shape: delta aggregation shuffles only the CHANGES (bounded by
  * the commit, not the table); the merge is one join on the group key,
  * bounded by |state| — and group-key cardinality is the reason the
  * view was materialized in the first place. */
object MaterializedAgg {

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")
  // sum(decimal(18,2)) widens to decimal(28,2) (Spark's +10 precision
  // headroom); the merged state stays at that type so repeated folds can
  // never overflow-null a sum that compute() could represent.
  private val sumType = "decimal(28,2)"

  /** From-scratch materialization: per-key row count, decimal-exact sums,
    * and per-sum NON-NULL value counts. Schema: keys…, n, sum_<col>…,
    * cnt_<col>…. The cnt columns exist so [[applyDelta]] can distinguish
    * "sum of zero values" (0.00) from "no non-null values" (NULL, which
    * is what a recompute's `sum()` yields) — without them a group whose
    * rows all carry NULL measures would materialize 0.00 and silently
    * break the bit-equal-to-recompute contract. */
  def compute(df: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(dec(c)).as(s"sum_$c")) ++
          sumCols.map(c => count(col(c)).as(s"cnt_$c")): _*)

  /** Fold one change feed (the [[ChangeFeed.changesBetween]] output for
    * the commit range since `state` was computed) into `state`. Groups
    * whose count reaches zero drop out, matching recompute semantics.
    * The merge join is NULL-SAFE on the group keys: `compute` groups
    * NULL keys into one group (SQL GROUP BY semantics), so the delta
    * must pair with that group too — a null-unsafe join would strand
    * both sides and silently diverge from recompute forever. */
  def applyDelta(state: DataFrame, changes: DataFrame,
                 keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    // Legacy-state migration: states materialized before the cnt_<col>
    // columns existed (keys…, n, sum_…) still fold — a missing count is
    // reconstructed as `n` when the sum is non-null (the old code's
    // implicit assumption: every row contributed) and `0` when the sum
    // is NULL, which preserves the legacy state's observable behavior
    // while new groups get exact counts.
    val state1 = sumCols.foldLeft(state) { (df, c) =>
      if (df.columns.contains(s"cnt_$c")) df
      else df.withColumn(s"cnt_$c",
        when(col(s"sum_$c").isNull, lit(0L)).otherwise(col("n")))
    }
    val w = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(w).as("__dn"),
        sumCols.map(c => sum(dec(c) * w).as(s"__ds_$c")) ++
          sumCols.map(c =>
            sum(when(col(c).isNotNull, w).otherwise(lit(0L))).as(s"__dc_$c")): _*)
    val zero = lit(0).cast(sumType)
    val s = state1.as("s")
    val d = delta.as("d")
    val cond = keys.map(k => col(s"s.$k") <=> col(s"d.$k")).reduce(_ && _)
    val merged = s.join(d, cond, "full_outer")
      .select((keys.map(k => coalesce(col(s"s.$k"), col(s"d.$k")).as(k)) :+
        (coalesce(col("s.n"), lit(0L)) + coalesce(col("d.__dn"), lit(0L))).as("n")) ++
        sumCols.map(c =>
          (coalesce(col(s"s.sum_$c"), zero) + coalesce(col(s"d.__ds_$c"), zero))
            .cast(sumType).as(s"__raw_$c")) ++
        sumCols.map(c =>
          (coalesce(col(s"s.cnt_$c"), lit(0L)) + coalesce(col(s"d.__dc_$c"), lit(0L)))
            .as(s"cnt_$c")): _*)
    // all-NULL groups report a NULL sum, exactly as a recompute would
    merged.select((keys.map(col) :+ col("n")) ++
        sumCols.map(c =>
          when(col(s"cnt_$c") === 0L, lit(null).cast(sumType))
            .otherwise(col(s"__raw_$c")).as(s"sum_$c")) ++
        sumCols.map(c => col(s"cnt_$c")): _*)
      .filter(col("n") > 0)
  }

  /** DURABLE exactly-once refresh: fold one change batch into a view
    * TABLE inside the consumer's transaction — the [[CdfTail]]
    * composition that keeps a materialized aggregate correct across
    * process restarts (`CdfTail.drainOnce(src, id)((txn, ch, _, _) =>
    * refreshInto(txn, view, ch, keys, sums))`: the view writes and the
    * feed cursor publish in ONE manifest swap, so a crash can never
    * double-fold a batch).
    *
    * Only groups PRESENT IN THE BATCH are touched: the staged view state
    * is semi-joined to the batch's group set, the [[applyDelta]] algebra
    * merges that bounded slice, survivors upsert and emptied groups
    * delete through [[Txn.applyChanges]]'s set-based MERGE. A refresh
    * therefore costs the delta's group set, never |view| — the property
    * that makes per-batch view maintenance viable on a 100 TB source.
    *
    * View schema contract: `keys…` (the unique key, NON-NULLABLE — the
    * MERGE pairs rows with null-unsafe key equality, so a NULL group
    * needs a COALESCEd surrogate upstream), `n` long, per sum column
    * `sum_<c> decimal(28,2)` nullable and `cnt_<c>` long. Returns the
    * number of view rows written or deleted. */
  def refreshInto(txn: Txn, view: GraftTable, changes: DataFrame,
                  keys: Seq[String], sumCols: Seq[String]): Long = {
    require(view.uniqueKeys.headOption.contains(keys),
      s"${view.name}: view unique key must be the group key $keys")
    keys.foreach(k => require(!view.schema(k).nullable,
      s"${view.name}: group key $k must be non-nullable in the view " +
        "(NULL groups need a COALESCEd surrogate upstream)"))
    val groups = changes.select(keys.map(col): _*).distinct()
      .toDF(keys.map(k => s"__g_$k"): _*)
    val cur = txn.read(view)
    val touchCond = keys.map(k => col(k) <=> col(s"__g_$k")).reduce(_ && _)
    val touched = cur.join(groups, touchCond, "left_semi")
    val live = applyDelta(touched, changes, keys, sumCols)
    val lk = live.select(keys.map(col): _*).toDF(keys.map(k => s"__g_$k"): _*)
    val dead = touched.join(lk, touchCond, "left_anti")
    val asChanges = live
      .select(view.schema.fieldNames.toIndexedSeq.map(col): _*)
      .withColumn("_change_type", lit("update_postimage"))
      .unionByName(dead
        .select(view.schema.fieldNames.toIndexedSeq.map(col): _*)
        .withColumn("_change_type", lit("delete")))
    txn.applyChanges(view, asChanges)
  }
}
