package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the observability audit every ingest runs
  * before curation decisions (schema drift, null explosions, cardinality
  * cliffs all show up here first at 100 TB, long before a query fails).
  *
  * Exact mode plans the k-column distinct counts as ONE scan with an
  * Expand (k× rows into the shuffle, each stream partially aggregated) —
  * no per-column rescans. That is the right audit-grade shape up to a
  * few columns; for wide-table continuous monitoring swap
  * `countDistinct` for `approx_count_distinct` and the Expand collapses
  * into plain partial aggregates (same output schema, ±2% cardinality).
  * min/max stringify AFTER aggregation — casting before would compare
  * lexicographically and profile "10" < "9".
  */
object Profile {

  /** Per-column stats over `cols`: (col_name, n_rows, n_nulls,
    * n_distinct, min_s, max_s), one row per column, stringified bounds.
    * NULLs are excluded from n_distinct (SQL count-distinct semantics)
    * and from the bounds. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_s, max_s)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
  }
}
