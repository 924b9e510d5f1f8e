package graft.pipeline

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight metric observation — the reference's counters and duration
  * histogram (`runner/locator.ts:41-50`) via `Dataset.observe`: metrics
  * accumulate during the SAME job that does the work (no second scan),
  * exactly like Effect's metric counters ride the workflow. */
object Metrics {

  /** Attach processed/failed/skipped counters to a status-bearing plan.
    * Returns the observed frame + the Observation handle (read `get`
    * after an action). */
  def observeStatus(df: DataFrame, statusCol: String = "status"): (DataFrame, Observation) = {
    val obs = new Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("processed"),
      count(when(col(statusCol) <=> lit(false), 1)).as("failed"),
      count(when(col(statusCol).isNull, 1)).as("pending"),
      count(when(col(statusCol) <=> lit(true), 1)).as("succeeded"))
    (observed, obs)
  }

  /** Duration histogram in the reference's shape: linear buckets, counted
    * in-flight (0–10 s in 10 buckets for stage 1, `locator.ts:47-50`). */
  def durationHistogram(df: DataFrame, durationCol: String,
                        lo: Double = 0, hi: Double = 10000,
                        buckets: Int = 10): DataFrame =
    df.select(TextFunctions.widthBucket(col(durationCol), lo, hi, buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
}
