package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for
  * `Window.orderBy(...)` with no partition spec (which moves the whole
  * dataset through ONE reducer; Spark itself warns `WindowExec: No
  * Partition Defined`).
  *
  * Strategy (classic two-pass ranking): range-repartition on the sort key
  * so partitions are globally ordered, fold each partition to one Long in
  * pass one (row count, value sum, ... — numPartitions values collected
  * to the driver: metadata, not data), then append one Long column in
  * pass two from the partition's prefix plus a per-row accumulator update.
  * Cost: two passes over the data instead of one pass through a single
  * machine; at 100 TB the second pass is embarrassingly parallel while
  * the single-reducer plan simply dies.
  */
object Ranking {

  /** Default partition count = the session's `spark.sql.shuffle.partitions`
    * — the knob a cluster operator already sizes to the data. A hardcoded
    * default would be right for local[32] and wrong for a 1000-executor
    * run; callers with better information (input bytes / target partition
    * size) pass an explicit count. */
  private def sessionParts(df: DataFrame): Int =
    scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      .toOption.filter(_ > 0).getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  /** Append a 0-based global position column (dense, gapless, ordered by
    * `sortCols`). Ties must be broken by `sortCols` itself — include a
    * unique tiebreak column for deterministic output. */
  def withGlobalPosition(df: DataFrame, posCol: String, sortCols: Seq[Column],
                         numPartitions: Int = -1): DataFrame =
    positioned(df, posCol, sortCols, numPartitions)._1

  /** Append an INCLUSIVE global running sum of `valueCol` (cast to long,
    * NULL as zero) over the `sortCols` order — `sum(v) OVER (ORDER BY …
    * ROWS UNBOUNDED PRECEDING)` without the single-reducer window. */
  def withGlobalPrefixSum(df: DataFrame, outCol: String, valueCol: Column,
                          sortCols: Seq[Column], numPartitions: Int = -1): DataFrame = {
    val tmp = "__gps_v"
    val withV = df.withColumn(tmp, coalesce(valueCol.cast("long"), lit(0L)))
    var vIdx = -1 // resolved against the sorted schema inside twoPass
    twoPass(withV, outCol, sortCols, numPartitions,
      resolve = schema => vIdx = schema.fieldIndex(tmp),
      fold = { it =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(vIdx)
        s
      },
      start = identity,
      next = (acc, row) => acc + row.getLong(vIdx))._1.drop(tmp)
  }

  /** Exact SQL `NTILE(k)` over a global order, without a global window:
    * first `n % k` tiles get `n/k + 1` rows, the rest `n/k` — bit-for-bit
    * the semantics DuckDB/Postgres implement, derived from the global
    * position instead of a single-reducer ntile. */
  def ntileExact(df: DataFrame, k: Int, tileCol: String, sortCols: Seq[Column],
                 numPartitions: Int = -1): DataFrame = {
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

  private def positioned(df: DataFrame, posCol: String, sortCols: Seq[Column],
                         numPartitions: Int): (DataFrame, Long) =
    twoPass(df, posCol, sortCols, numPartitions,
      resolve = _ => (),
      fold = { it =>
        // Long counter, not Iterator.size — that one is Int and wraps
        // negative past 2^31 rows per partition
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      },
      start = _ - 1, // emit-after-update yields offset, offset+1, ...
      next = (acc, _) => acc + 1)

  /** The shared two-pass scaffold. Both passes MUST see the same range
    * boundaries: range-exchange boundary sampling is seeded per RDD id,
    * so two separately-planned executions could partition differently;
    * pinning ONE RDD makes the second job reuse the first job's shuffle
    * output (stage skipped), so the pass-one folds and the pass-two rows
    * describe the same physical partitions. The pinned RDD is the
    * INTERNAL (Tungsten) one: `df.rdd` would box every field of every
    * row into an external Row on both passes. The appended value rides
    * as a JoinedRow over the unmodified shuffle row — zero per-field
    * copying; the downstream scan node's UnsafeProjection materializes
    * it.
    *
    * @param resolve called once with the SORTED schema (field-index setup)
    * @param fold    pass 1: one Long per partition, collected to the driver
    * @param start   maps the partition's exclusive prefix (scanLeft of the
    *                folds) to the pass-2 accumulator seed
    * @param next    pass 2: new accumulator value for a row — EMITTED as
    *                the appended column
    */
  private def twoPass(df: DataFrame, outCol: String, sortCols: Seq[Column],
                      numPartitions: Int,
                      resolve: org.apache.spark.sql.types.StructType => Unit,
                      fold: Iterator[InternalRow] => Long,
                      start: Long => Long,
                      next: (Long, InternalRow) => Long): (DataFrame, Long) = {
    val parts = if (numPartitions > 0) numPartitions else sessionParts(df)
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    resolve(sorted.schema)
    val rdd = org.apache.spark.sql.graftbridge.InternalRowBridge.toRdd(sorted)
    val folds = rdd.mapPartitions(it => Iterator(fold(it)), true).collect()
    val offsets = folds.scanLeft(0L)(_ + _).init
    val total = folds.sum
    val withOut = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val outRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var acc = start(offsets(pid))
      it.map[InternalRow] { row =>
        acc = next(acc, row)
        outRow.setLong(0, acc)
        joined(row, outRow)
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    (org.apache.spark.sql.graftbridge.InternalRowBridge.fromRdd(
      df.sparkSession, withOut, outSchema), total)
  }
}
