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
  /** Sketch-audited per-group cardinality: returns the EXACT distinct
    * count of `valCol` per `keyCol`, after asserting that the
    * HyperLogLog++ estimate (`approx_count_distinct`, relative sd `rsd`)
    * agrees within `tolSigma`·rsd (+1 for integer rounding at tiny
    * cardinalities). The point of the gate is the AGREEMENT: at 100 TB
    * the continuous profile runs the sketch (mergeable, fixed-size
    * state, no distinct shuffle) and only a sampled audit pays for
    * exactness — this operator IS that audit, exact and approximate in
    * one partial-aggregable scan.
    *
    * The audit collects one row per group — callers pass a bounded
    * audit key (event types, sources, shards), not a high-cardinality
    * column. Output is recomputed as its own plan so the returned frame
    * stays a distributed exact aggregate.
    */
  def cardinalityAudit(df: DataFrame, keyCol: String, valCol: String,
                       rsd: Double = 0.02, tolSigma: Double = 6.0): DataFrame = {
    val audited = df.groupBy(col(keyCol))
      .agg(countDistinct(col(valCol)).as("n_exact"),
        approx_count_distinct(col(valCol), rsd).as("n_approx"))
      .collect() // bounded: one row per audit group
    audited.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      require(math.abs(approx - exact) <= exact * rsd * tolSigma + 1.0,
        s"cardinality sketch out of tolerance for ${r.get(0)}: " +
          s"approx $approx vs exact $exact (rsd=$rsd)")
    }
    df.groupBy(col(keyCol))
      .agg(countDistinct(col(valCol)).as("n_distinct"))
  }

  /** Sketch-audited point frequencies — the [[cardinalityAudit]] pattern
    * for the count–min sketch: returns the EXACT per-value counts of
    * `valCol`, after asserting that the count–min estimate respects both
    * sides of its guarantee for every audited value:
    *
    *   exact ≤ estimate ≤ exact + (e/width)·N
    *
    * (one-sided overestimate from collisions; the additive slack is the
    * standard ε·N bound with ε = e/width). At 100 TB the continuous
    * profile keeps ONLY the sketch — a fixed 64 KB mergeable grid per
    * partial buffer, no vocabulary-keyed shuffle — and this audit is the
    * sampled exactness check run against a bounded set of audit values
    * (event types, sources, shards; one exact-count row each).
    *
    * The audited value set is BOUNDED BY CONSTRUCTION, not by hope: pass
    * `auditValues` to name the values to check, or rely on the
    * `maxAuditValues` cap — a column with more distinct values than the
    * cap REFUSES (the sketch's 100 TB use case is exactly the
    * high-cardinality column where collecting the full distinct set is
    * a driver OOM; auditing "all of them" there was never meaningful).
    */
  def frequencyAudit(df: DataFrame, valCol: String,
                     depth: Int = 4, width: Int = 2048,
                     auditValues: Seq[String] = Nil,
                     maxAuditValues: Int = 4096): DataFrame = {
    import graft.functions.CountMin
    val grid = df.agg(CountMin.sketch(col(valCol), depth, width).as("s"))
      .collect()(0).getSeq[Long](0).toArray // fixed depth×width longs
    val n = grid.slice(0, width).sum // row 0 counts every non-null once
    val slack = math.ceil(math.E / width * n).toLong
    // Audit under Spark's OWN cast-to-string rendering — the exact
    // string the sketch hashed (CountMin.sketch casts its child). The
    // JVM rendering diverges for typed columns (java.sql.Timestamp
    // appends '.0', BigDecimal keeps scale), and hashing the JVM string
    // would miss every real increment and abort the est>=ex bound
    // spuriously. Grouping by the cast string is also the consistent
    // count: raw values that render identically share sketch cells.
    val exact = df.groupBy(col(valCol).cast("string").as("value"))
      .agg(count(lit(1)).as("n_exact"))
    val auditRows =
      if (auditValues.nonEmpty)
        exact.filter(col("value").cast("string").isin(auditValues: _*))
          .collect() // bounded: |auditValues| rows at most
      else {
        // limit(cap+1) bounds the collect even when the require fires
        val head = exact.limit(maxAuditValues + 1).collect()
        require(head.length <= maxAuditValues,
          s"frequencyAudit: $valCol has more than $maxAuditValues distinct " +
            "values — pass auditValues to bound the audit")
        head
      }
    auditRows.foreach { r => // bounded: one row per audit value
      val v = r.get(0)
      if (v != null) {
        val est = CountMin.estimate(grid, depth, width, v.toString)
        val ex = r.getLong(1)
        require(est >= ex && est <= ex + slack,
          s"count-min out of bounds for '$v': estimate $est vs exact $ex " +
            s"(+ slack $slack over n=$n)")
      }
    }
    // recomputed as its own plan — the returned frame stays a
    // distributed exact aggregate, same choice as cardinalityAudit.
    // Keyed by the SAME cast-string rendering the audit verified, so
    // result keys and sketch keys always agree (a raw-typed key would
    // split values the sketch merged).
    df.groupBy(col(valCol).cast("string").as("value"))
      .agg(count(lit(1)).as("n_exact"))
  }

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

  /** Sketch-audited quantiles — the [[cardinalityAudit]] pattern for
    * order statistics: returns the EXACT per-group percentiles
    * (continuous interpolation, the engine-portable `quantile_cont`
    * semantics), after asserting that the mergeable
    * `approx_percentile` sketch lands inside each target's exact
    * [p−tolProb, p+tolProb] value bracket — the value-space image of
    * its rank-error guarantee (≤ n/accuracy, so tolProb must be ≥
    * 1/accuracy). At 100 TB the continuous profile runs the sketch
    * (fixed-size mergeable state, no sort, no full shuffle of values);
    * this audit is the sampled exactness check that keeps trusting it
    * honest. Audit groups are bounded (event types, sources, shards) —
    * one collected row each.
    *
    * @return (keyCol, p, q) — one row per group × probability, exact.
    */
  def quantileAudit(df: DataFrame, keyCol: String, valCol: String,
                    probs: Seq[Double], accuracy: Int = 10000,
                    tolProb: Double = 0.01): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      "probs must lie strictly inside (0, 1)")
    require(tolProb * accuracy >= 1.0,
      s"tolProb $tolProb is tighter than the sketch guarantee 1/$accuracy")
    val lo = probs.map(p => math.max(0.0, p - tolProb))
    val hi = probs.map(p => math.min(1.0, p + tolProb))
    def pct(ps: Seq[Double], alias: String) = expr(
      s"percentile($valCol, array(${ps.mkString(", ")}))").as(alias)
    val audited = df.groupBy(col(keyCol))
      .agg(pct(lo, "__lo"), pct(hi, "__hi"),
        expr(s"approx_percentile($valCol, array(${probs.mkString(", ")}), " +
          s"$accuracy)").as("__ap"),
        count(col(valCol)).as("__n"))
      .collect() // bounded: one row per audit group
    audited.foreach { r =>
      // Skip groups with nothing auditable: all-NULL values have no
      // order statistics (exact and approx both NULL — the result frame
      // reports NULL quantiles consistently), and a group smaller than
      // ~2/tolProb gives the probability bracket sub-rank width — the
      // continuous interpolation can then exclude the sketch's discrete
      // data-value answer even when it is exactly right. Small groups
      // are cheap to check exactly; the audit exists for the big ones.
      val auditable = !r.isNullAt(1) && !r.isNullAt(3) &&
        r.getLong(4) * tolProb >= 2.0
      if (auditable) {
        val blo = r.getSeq[Double](1); val bhi = r.getSeq[Double](2)
        val ap = r.getSeq[Double](3)
        probs.indices.foreach { i =>
          require(ap(i) >= blo(i) && ap(i) <= bhi(i),
            s"quantile sketch out of tolerance for ${r.get(0)} p=${probs(i)}: " +
              s"approx ${ap(i)} outside exact bracket [${blo(i)}, ${bhi(i)}]")
        }
      }
    }
    // recomputed as its own plan — same deliberate choice as
    // [[cardinalityAudit]]: the returned frame stays a distributed exact
    // aggregate instead of a driver-collected LocalRelation
    df.groupBy(col(keyCol))
      .agg(pct(probs, "__q"))
      .select(col(keyCol),
        explode(arrays_zip(typedlit(probs).as("p"), col("__q").as("q"))).as("__e"))
      .select(col(keyCol), col("__e.p").as("p"), col("__e.q").as("q"))
  }

  /** Distribution drift between two slices of a numeric column:
    * per-bin Population Stability Index contributions — the
    * between-snapshot / between-source alarm a continuous ingest runs
    * to catch a producer silently changing its value distribution
    * (the round-8 timestamp-encoding incident, but for data values).
    * Σ psi < 0.1 is the conventional "stable" band, > 0.25 "shifted".
    *
    * Bins are EXPLICIT fixed-width (`floor(value / binWidth)`), not
    * corpus-derived quantiles, so the binning is one scan-side codegen
    * expression, needs no first pass over the data, and an independent
    * engine reproduces it exactly. Shares are add-one smoothed over the
    * union of observed bins (no ln(0)); the single ln() and divisions
    * mirror term-for-term under the round-6 libm-parity contract.
    *
    * Scale shape: one partial-aggregable count per side (shuffle
    * bounded by bins, not rows), one full-outer join on bin id, the
    * totals broadcast from a 1-row frame. Nothing driver-side.
    */
  def drift(a: DataFrame, b: DataFrame, valueCol: String,
            binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // NULLs are not observations of the distribution — and a NULL bin
    // would split into two unpaired rows under the join below (null-
    // unsafe equality), inflating the smoothing union
    def binned(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val joined = binned(a, "n_a").join(binned(b, "n_b"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val totals = joined.agg(
      sum(col("n_a")).as("__ta"), sum(col("n_b")).as("__tb"),
      count(lit(1)).as("__k"))
    val pa = (col("n_a") + 1.0) / (col("__ta") + col("__k"))
    val pb = (col("n_b") + 1.0) / (col("__tb") + col("__k"))
    joined.crossJoin(broadcast(totals))
      .withColumn("psi", round((pa - pb) * log(pa / pb), 6))
      .select(col("bin"), col("n_a"), col("n_b"), col("psi"))
  }
}
