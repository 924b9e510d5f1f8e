package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed band (range) join.
  *
  * Joins rows whose times fall within a band of each other:
  * `right.t ∈ [left.t - before, left.t + after]`, optionally on an equal
  * key as well. Spark plans a raw inequality join as a broadcast
  * nested-loop (or a cartesian product when neither side fits in memory) —
  * O(|L|·|R|) comparisons, the classic 100 TB killer.
  *
  * Plan here: quantize time into buckets of width `w = before + after`.
  * A band of that span overlaps at most TWO consecutive buckets, so the
  * left side explodes into ≤2 (key, bucket) candidate rows, the right side
  * computes its single bucket, and the band join becomes an EQUI-join on
  * (key, bucket) followed by the exact band filter. Cost: one hash shuffle
  * with ≤2× amplification of the left side — sort-merge/shuffled-hash
  * territory, never nested-loop. The bucket column is derived (no storage),
  * and scan-level filters/pruning on both inputs are unaffected.
  *
  * Skew: a hot (key, bucket) pair behaves exactly like a hot join key —
  * compose with [[Skew.saltedJoin]] if one time slice dominates.
  */
object RangeJoin {

  /** Band join with the band declared in seconds but COMPARED at
    * microsecond precision — timestamps in the wild carry sub-second
    * components, and truncating both sides to whole seconds (an earlier
    * revision did) admits rows up to ~1 s OUTSIDE the declared band;
    * with `after = 0` (the attribution shape) that silently credited
    * touchpoints that happened after the conversion.
    *
    * @param leftTime/rightTime columns castable to timestamp
    * @param before  band extent backwards from left.t, in seconds (>= 0)
    * @param after   band extent forwards from left.t, in seconds (>= 0)
    * @return left columns + right columns of matching pairs (inner join)
    */
  def bandJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      s"band [$before, $after] must be non-negative and non-empty")
    val w = (before + after) * 1000000L // bucket width in micros
    val beforeUs = before * 1000000L
    val afterUs = after * 1000000L

    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

    val lUs = micros(left(leftTime))
    // floor-div of possibly-negative epochs: Spark's `div` truncates toward
    // zero, so use floor(); epochs here are positive, but pre-1970 data
    // stays correct this way.
    def fdiv(c: Column): Column = floor(c.cast("double") / lit(w.toDouble)).cast("long")
    val loBucket = fdiv(lUs - lit(beforeUs))
    val hiBucket = fdiv(lUs + lit(afterUs))

    val lExploded = left
      .withColumn("__bucket", explode(array_distinct(array(loBucket, hiBucket))))
    val rBucketed = right.withColumn("__bucket", fdiv(micros(right(rightTime))))

    val rUs = micros(rBucketed(rightTime))
    val lUs2 = micros(lExploded(leftTime))
    // A right row owns exactly one bucket and the left's ≤2 candidates are
    // distinct, so each qualifying (left, right) pair joins exactly once —
    // no post-join dedup needed.
    lExploded.join(rBucketed,
        lExploded(leftKey) === rBucketed(rightKey) &&
        lExploded("__bucket") === rBucketed("__bucket") &&
        rUs >= lUs2 - lit(beforeUs) && rUs <= lUs2 + lit(afterUs))
      .drop(lExploded("__bucket")).drop(rBucketed("__bucket"))
  }
}
