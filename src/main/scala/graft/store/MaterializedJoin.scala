package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for an INNER equi-join view over the
  * [[ChangeFeed]] — the join companion of [[MaterializedAgg]]: keep
  * `A ⋈ B` materialized across commits by folding in each side's change
  * feed instead of re-joining the base tables. At 100 TB the difference
  * between touching commit-bounded deltas and re-shuffling two full
  * tables every refresh.
  *
  * The algebra is the classic signed delta-join decomposition:
  *
  *   J_new − J_old = ΔA ⋈ B_new  +  A_old ⋈ ΔB
  *
  * (multiset, with insert/update_postimage weighing +1 and
  * delete/update_preimage −1; the ΔA⋈ΔB cross term lives inside
  * ΔA⋈B_new because B_new already contains ΔB's effect, and each old
  * contribution is removed exactly once — a join-key-moving update on A
  * whose OLD partner was simultaneously deleted from B cancels through
  * A_old⋈ΔB, not twice.) Both inputs the decomposition needs come from
  * store primitives: `snapshotAt(from)` supplies A_old (time travel)
  * and `snapshot()` supplies B_new, so the maintainer composes entirely
  * from the COW store's existing surface.
  *
  * State is a MULTISET: one row per distinct joined row with its
  * multiplicity `__m` — value-only updates flow as (−old row, +new row)
  * rather than an in-place patch, so the state needs no per-view key
  * and stays correct even when the joined row set has genuine
  * duplicates. Groups whose multiplicity reaches zero drop out,
  * matching recompute semantics bit-for-bit.
  *
  * Scale shape: ΔA⋈B_new and A_old⋈ΔB each shuffle one commit-bounded
  * delta against one base side (broadcast-able when the commit is
  * small; slice-stat pushdown prunes the base scan by join key); the
  * state merge is one null-safe join on the row image, bounded by
  * |state| + |Δ| — the base tables are never re-scanned. */
object MaterializedJoin {

  /** Signed CDF weight (same vocabulary as [[MaterializedAgg]]). */
  private def w = when(col("_change_type").isin("insert", "update_postimage"),
    lit(1L)).otherwise(lit(-1L))

  /** From-scratch materialization of `a ⋈ b` on the using-columns `on`:
    * one row per distinct joined row plus its multiplicity `__m`. */
  def compute(a: DataFrame, b: DataFrame, on: Seq[String]): DataFrame = {
    val j = a.join(b, on, "inner")
    j.groupBy(j.columns.map(col).toSeq: _*).agg(count(lit(1)).as("__m"))
  }

  /** Fold one commit range into `state`. `changesA`/`changesB` are the
    * [[ChangeFeed.changesBetween]] outputs for the range, `aOld` the A
    * side AS OF the range start (`snapshotAt(from)`), `bNew` the B side
    * at the range end (`snapshot()`). The merge join is NULL-SAFE on
    * every state column: NULL-valued images must pair with their state
    * row, or both sides strand and the view diverges from recompute. */
  def applyDelta(state: DataFrame,
                 changesA: DataFrame, aOld: DataFrame,
                 changesB: DataFrame, bNew: DataFrame,
                 on: Seq[String]): DataFrame = {
    val valueCols = state.columns.filterNot(_ == "__m").toSeq
    val dJa = changesA.withColumn("__w", w).drop("_change_type")
      .join(bNew, on, "inner")
    val dJb = aOld.join(
      changesB.withColumn("__w", w).drop("_change_type"), on, "inner")
    val delta = dJa.select((valueCols.map(col) :+ col("__w")): _*)
      .unionByName(dJb.select((valueCols.map(col) :+ col("__w")): _*))
      .groupBy(valueCols.map(col): _*).agg(sum(col("__w")).as("__dm"))
    val s = state.as("s")
    val d = delta.as("d")
    val cond = valueCols.map(c => col(s"s.$c") <=> col(s"d.$c")).reduce(_ && _)
    s.join(d, cond, "full_outer")
      .select(valueCols.map(c => coalesce(col(s"s.$c"), col(s"d.$c")).as(c)) :+
        (coalesce(col("s.__m"), lit(0L)) + coalesce(col("d.__dm"), lit(0L)))
          .as("__m"): _*)
      .filter(col("__m") > 0)
  }
}
