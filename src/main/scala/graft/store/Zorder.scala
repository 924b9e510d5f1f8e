package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping.
  *
  * Sorting a slice by ONE column tightens per-file ranges for that column
  * only; interleaving the bits of several columns' rank positions gives
  * every participating column locality, so a range predicate on ANY of
  * them skips most files (the Databricks/Iceberg `ZORDER BY` idea). Used
  * by [[GraftTable.compact]]: rewrite the slice ordered by z-value, let
  * [[SliceStats]] pin the now-narrow per-file ranges, and
  * [[GraftTable.snapshotWhere]] prunes at file granularity.
  *
  * The z-value is computed from each column quantized into `bitsPer`-bit
  * rank space between its slice min/max (one tiny agg supplies the
  * bounds), then bit-interleaved — all plain codegen'd integer arithmetic,
  * no UDF. NULLs quantize to 0 (cluster together at the low end).
  */
object Zorder {

  /** Quantize `c` into [0, 2^bits) over [mn, mx]; degenerate ranges and
    * NULLs map to 0. */
  private def quantize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val buckets = (1L << bits) - 1
    if (mx <= mn) lit(0L)
    else coalesce(
      least(lit(buckets), greatest(lit(0L),
        floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(buckets.toDouble))
          .cast("long"))),
      lit(0L))
  }

  /** Interleave the bits of `qs` (each already in [0, 2^bits)): output bit
    * `j * k + i` is bit `j` of `qs(i)`. Unrolled shifts/masks — constant
    * structure, whole-stage-codegen friendly. */
  private def interleave(qs: Seq[Column], bits: Int): Column = {
    val k = qs.size
    val terms = for {
      j <- 0 until bits
      (q, i) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** The z-value column over `cols` with per-column [min, max] bounds.
    * `bitsPer` defaults keep the z-value inside a signed 64-bit long. */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bitsPer: Int = 0): Column = {
    require(cols.nonEmpty && cols.size <= 6, s"z-order over 1..6 columns")
    val bits = if (bitsPer > 0) bitsPer else math.min(16, 62 / cols.size)
    require(bits * cols.size <= 62, s"z-value overflows a long: $bits×${cols.size}")
    val qs = cols.lazyZip(mins).lazyZip(maxs).map {
      (c, mn, mx) => quantize(c, mn, mx, bits)
    }
    interleave(qs.toSeq, bits)
  }

  /** Append a z-value column named `as` computed over `zorderBy`, bounds
    * taken from one aggregation over `df` (numeric/date/timestamp columns;
    * anything non-castable to double is rejected by analysis). */
  def withZValue(df: DataFrame, zorderBy: Seq[String], as: String): DataFrame = {
    val aggs = zorderBy.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"),
      max(col(c).cast("double")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = zorderBy.indices.map(i => Option(row.get(2 * i))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    val maxs = zorderBy.indices.map(i => Option(row.get(2 * i + 1))
      .map(_.asInstanceOf[Double]).getOrElse(0.0))
    df.withColumn(as, zValue(zorderBy.map(col), mins, maxs))
  }
}
