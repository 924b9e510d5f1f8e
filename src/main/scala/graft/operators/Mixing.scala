package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset mixture weighting — the "3 epochs of curated text, 0.5 epochs
  * of web crawl" recipe every pretraining data pipeline runs.
  *
  * A weight of e means each row appears floor(e) times, plus one more
  * time for a deterministic [[Sampling]] hash-draw of the fractional
  * part — so the realized mixture is exact in expectation, reproducible
  * row-for-row (no PRNG), and the expansion is a codegen'd
  * `explode(sequence(...))`, shuffle-free. The `epoch` column tags each
  * copy (1-based) so downstream shuffling/sharding can keep copies of the
  * same document apart.
  */
object Mixing {

  /** Repeat every row `epochs` times (fractional part via deterministic
    * hash-draw on `key`). Adds an `epoch` column; rows with zero realized
    * copies are dropped. */
  def withEpochs(df: DataFrame, key: Column, epochs: Double): DataFrame =
    expand(df, copiesFor(key, epochs))

  /** Per-source mixture: `weights` maps source value → epochs; unlisted
    * sources get `defaultEpochs`. One codegen'd CASE, no join. */
  def mixture(df: DataFrame, key: Column, source: Column,
              weights: Map[String, Double], defaultEpochs: Double): DataFrame = {
    val copies = weights.foldLeft(copiesFor(key, defaultEpochs)) {
      case (acc, (value, e)) => when(source === lit(value), copiesFor(key, e)).otherwise(acc)
    }
    expand(df, copies)
  }

  private def copiesFor(key: Column, epochs: Double): Column = {
    require(epochs >= 0, s"epochs $epochs must be >= 0")
    val whole = epochs.toInt
    val frac = epochs - whole
    // the SAME draw as Sampling — a doc's fractional-epoch membership is
    // consistent with any hash-sampled split of the same key
    when(Sampling.keepPredicate(key, frac), lit(whole + 1)).otherwise(lit(whole))
  }

  private def expand(df: DataFrame, copies: Column): DataFrame =
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__copies"))))
      .drop("__copies")
}
