package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec (which moves the whole
  * dataset through ONE reducer; Spark itself warns `WindowExec: No
  * Partition Defined`).
  *
  * Strategy (classic two-pass ranking): range-repartition on the sort key
  * so partitions are globally ordered, rank within each partition, then
  * shift each partition's ranks by the total row count of the partitions
  * before it. The per-partition counts are numPartitions values collected
  * to the driver — metadata, not data. Cost: two passes over the data
  * instead of one pass through a single machine; at 100 TB the second pass
  * is embarrassingly parallel while the single-reducer plan simply dies.
  */
object Ranking {

  /** Append a 0-based global position column (dense, gapless, ordered by
    * `sortCols`). Ties must be broken by `sortCols` itself — include a
    * unique tiebreak column for deterministic output. */
  def withGlobalPosition(df: DataFrame, posCol: String, sortCols: Seq[Column],
                         numPartitions: Int = 32): DataFrame =
    positioned(df, posCol, sortCols, numPartitions)._1

  /** Exact SQL `NTILE(k)` over a global order, without a global window:
    * first `n % k` tiles get `n/k + 1` rows, the rest `n/k` — bit-for-bit
    * the semantics DuckDB/Postgres implement, derived from the global
    * position instead of a single-reducer ntile. */
  def ntileExact(df: DataFrame, k: Int, tileCol: String, sortCols: Seq[Column],
                 numPartitions: Int = 32): DataFrame = {
    val (pos, n) = positioned(df, "__gr_pos", sortCols, numPartitions)
    val q = n / k
    val r = n % k
    val cut = r * (q + 1)
    val p = col("__gr_pos")
    // integral `div`, not Column `/` (double division loses exactness for
    // positions approaching 2^53)
    val bucket =
      if (q == 0) p // fewer rows than tiles: row i lands in tile i+1
      else when(p < cut, expr(s"__gr_pos div ${q + 1}"))
        .otherwise(lit(r) + expr(s"(__gr_pos - $cut) div $q"))
    pos.withColumn(tileCol, (bucket + 1).cast("long")).drop("__gr_pos")
  }

  /** Append an INCLUSIVE global running sum of `valueCol` (a non-negative
    * long) over the `sortCols` order — `sum(v) OVER (ORDER BY … ROWS
    * UNBOUNDED PRECEDING)` without the single-reducer window. Same
    * two-pass shape as [[withGlobalPosition]]: per-partition sums are
    * numPartitions longs to the driver, pass two adds the partition
    * prefix to a partition-local running sum. Ties must be broken by
    * `sortCols` itself for deterministic output. */
  def withGlobalPrefixSum(df: DataFrame, outCol: String, valueCol: Column,
                          sortCols: Seq[Column], numPartitions: Int = 32): DataFrame = {
    val tmp = "__gps_v"
    val withV = df.withColumn(tmp, coalesce(valueCol.cast("long"), lit(0L)))
    val sorted = withV.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex(tmp)
    // pin ONE rdd so both passes see the same range boundaries (below)
    val rdd = org.apache.spark.sql.graftbridge.InternalRowBridge.toRdd(sorted)
    val sums = rdd.mapPartitions(it => {
      var s = 0L
      while (it.hasNext) s += it.next().getLong(vIdx)
      Iterator(s)
    }, true).collect()
    val offsets = sums.scanLeft(0L)(_ + _).init
    val withSum = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val sumRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var s = offsets(pid)
      it.map[org.apache.spark.sql.catalyst.InternalRow] { row =>
        s += row.getLong(vIdx)
        sumRow.setLong(0, s)
        joined(row, sumRow)
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    org.apache.spark.sql.graftbridge.InternalRowBridge.fromRdd(
      df.sparkSession, withSum, outSchema).drop(tmp)
  }

  private def positioned(df: DataFrame, posCol: String, sortCols: Seq[Column],
                         numPartitions: Int): (DataFrame, Long) = {
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // Both passes MUST see the same range boundaries. Range-exchange
    // boundary sampling is seeded per RDD id, so two separate DataFrame
    // executions could partition differently; pinning ONE RDD makes the
    // second job reuse the first job's shuffle output (stage skipped), so
    // the counts and the ranks describe the same physical partitions.
    // The pinned RDD is the INTERNAL (Tungsten) one: `df.rdd` would box
    // every field of every row into an external Row on both passes.
    val rdd = org.apache.spark.sql.graftbridge.InternalRowBridge.toRdd(sorted)
    // pass 1: per-partition row counts (numPartitions longs to the driver)
    val counts = rdd.mapPartitions(it => Iterator(it.size.toLong), true).collect()
    val offsets = counts.scanLeft(0L)(_ + _).init
    val total = counts.sum
    // pass 2: partition-local index + the preceding partitions' offset
    // (Long counter, not Iterator.zipWithIndex — that one is Int and wraps
    // negative past 2^31 rows per partition). The position rides as a
    // JoinedRow over the unmodified shuffle row — zero per-field copying;
    // the downstream scan node's UnsafeProjection materializes it.
    val withPos = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val posRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var j = offsets(pid) - 1
      it.map[org.apache.spark.sql.catalyst.InternalRow] { row =>
        j += 1
        posRow.setLong(0, j)
        joined(row, posRow)
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        posCol, org.apache.spark.sql.types.LongType, nullable = false))
    (org.apache.spark.sql.graftbridge.InternalRowBridge.fromRdd(
      df.sparkSession, withPos, outSchema), total)
  }
}
