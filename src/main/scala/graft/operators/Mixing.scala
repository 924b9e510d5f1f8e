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

  /** Temperature-scaled source epochs — the multilingual/source-balancing
    * knob (sample with q_i ∝ p_i^alpha; alpha=1 keeps natural proportions,
    * alpha→0 approaches uniform over sources). Returned epochs are scaled
    * to PRESERVE the total row count in expectation
    * (`epochs_i = q_i · N / n_i`) and rounded to 6 decimals so the same
    * recipe re-derived elsewhere reproduces identical hash-draw decisions.
    * `counts` is (source → row count) — one small aggregation the caller
    * collects (bounded by the number of sources, not the corpus). */
  def temperatureEpochs(counts: Map[String, Long], alpha: Double): Map[String, Double] = {
    require(alpha > 0, s"alpha $alpha must be > 0")
    require(counts.values.forall(_ >= 0), "negative source count")
    val total = counts.values.sum.toDouble
    if (total == 0) return counts.map { case (s, _) => s -> 0.0 }
    val powSum = counts.values.map(n => math.pow(n / total, alpha)).sum
    counts.map { case (s, n) =>
      val q = math.pow(n / total, alpha) / powSum
      val e = if (n == 0) 0.0 else q * total / n
      s -> (math.rint(e * 1e6) / 1e6)
    }
  }

  /** [[mixture]] with temperature-derived weights: one count aggregation
    * over the source column, then the usual codegen'd CASE expansion. */
  def temperatureMixture(df: DataFrame, key: Column, source: Column,
                         alpha: Double): DataFrame = {
    val counts = df.groupBy(source.as("__src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    mixture(df, key, source, temperatureEpochs(counts, alpha), defaultEpochs = 0.0)
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

  /** Deterministic weighted interleaving — MATERIALIZE the global
    * training order in which each source's documents appear in
    * proportion to its weight (the mixture-schedule step after
    * [[mixture]]/[[temperatureEpochs]] decide the weights): source s's
    * i-th document (1-based, ordered by `idCol`) is scheduled at virtual
    * time (2i−1)/(2·w_s) — stride scheduling / weighted round-robin —
    * so every prefix of the order carries each source at ≈ w_s/Σw.
    * Virtual-time ties break by (source, id), making the order total and
    * engine-portable (both sides compute the identical IEEE division of
    * exact small integers).
    *
    * Scale shape: one window partitioned BY SOURCE for the per-source
    * rank (each partition is one source's rows — bounded, parallel), and
    * the two-pass distributed ranking for the global position — no
    * single-partition window anywhere. Rows where `weight` is NULL or
    * ≤ 0 are dropped (a zero-weight source supplies nothing).
    *
    * @param weight per-row weight expression (a literal CASE over the
    *        source column, a joined column — caller's choice)
    * @return input columns + 0-based `global_pos` */
  def interleaveByWeight(df: DataFrame, idCol: String, sourceCol: String,
                         weight: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
    val ranked = df
      .withColumn("__w", weight.cast("double"))
      .filter(col("__w").isNotNull && col("__w") > 0)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__vt",
        (col("__rn") * 2 - 1).cast("double") / (col("__w") * lit(2.0)))
    Ranking.withGlobalPosition(ranked, "global_pos",
        Seq(col("__vt"), col(sourceCol), col(idCol)))
      .drop("__w", "__rn", "__vt")
  }
}
