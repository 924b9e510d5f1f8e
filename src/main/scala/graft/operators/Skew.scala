package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for 100 TB joins/aggregations.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense; these helpers cover the cases
  * AQE can't fix — a priori known hot keys, and skewed aggregations where
  * the explosion happens before any shuffle stats exist.
  */
object Skew {

  /** Salted equi-join: the left (large, skewed) side gets a random salt in
    * [0, factor); the right side is replicated `factor` times with every
    * salt value. The join key becomes (key, salt) — a hot key's rows
    * spread over `factor` reducers instead of one straggler.
    *
    * Cost: right side replicated ×factor — use when right ≪ left but too
    * big (or too dynamic) to broadcast outright. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int = 8, joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key — the map-side-combine idea made explicit for
    * aggregates Spark can't partially compute (e.g. collect-based). For
    * algebraic aggregates Spark already does this; use for the rest. */
  def twoPhaseCollect(df: DataFrame, key: String, valueCol: String,
                      factor: Int = 8): DataFrame =
    df.withColumn("__salt", (rand(42) * factor).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__partial"))).as(s"${valueCol}_list"))

  /** Top frequent keys — cheap reconnaissance to decide salting/broadcast
    * (one pass + small sort). */
  def hotKeys(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
