package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal dimension modeling — turning an append-only event log into the
  * versioned "what was true when" shape every warehouse dimension (and
  * every point-in-time training-data join) needs. The reference keeps only
  * the LATEST status per row (`status` columns overwritten in place,
  * `runner/locator.ts` state machine); this is the history-preserving
  * counterpart: SCD Type-2 validity intervals derived from the log.
  *
  * Scale shape: one shuffle on the entity key; the change filter, version
  * numbering, and interval close all ride the SAME (key, order) window
  * sort, so Catalyst plans a single Window chain over one Exchange —
  * adding history never costs a second shuffle. Per-key state is a sort
  * run, not a collected list; a hot entity with millions of events sorts
  * within its partition (salt upstream if one key exceeds a partition).
  */
object Temporal {

  /** SCD Type-2 build: collapse an event log to one row per VALUE CHANGE
    * of `attrCol` per `keyCol`, with `valid_from` / `valid_to` interval
    * bounds (half-open; `valid_to` NULL = current), a 1-based `version`,
    * and an `is_current` flag.
    *
    * Consecutive events carrying the same attribute value collapse into
    * one version (only transitions create rows — the defining SCD2
    * property). Ordering is (`tsCol`, `tieCol`) so same-timestamp events
    * resolve deterministically.
    */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    // second window over the CHANGE rows: same partitioning and ordering,
    // so the sort from the first window is reusable (one Exchange total)
    val wc = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("version", row_number().over(wc).cast("long"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Cohort retention matrix: users bucketed by the period of their
    * FIRST event (the cohort), then counted distinct per (cohort,
    * period-offset) — the classic retention triangle product analytics
    * reads ("of the week-12 cohort, how many were still active in week
    * 15?"). Periods are integer epoch divisions (`epoch_us div
    * periodUs`), so bucketing is scan-side codegen and engine-exact.
    *
    * Scale shape: one aggregation for first-events (map-side
    * combinable min per user), one broadcast-or-shuffle join back on
    * the user key, one (cohort, offset) count-distinct — shuffles
    * bounded by |users| then |cohorts × offsets|. No windows, no
    * driver state.
    *
    * @return (cohort, period_offset, n_users) — offset-0 row is the cohort
    *         size itself
    */
  def retentionMatrix(events: DataFrame, userCol: String, tsCol: String,
                      periodUs: Long = 604800000000L): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    val period = expr(
      s"unix_micros(cast($tsCol as timestamp)) div ${periodUs}L")
    val withPeriod = events.select(col(userCol).as("__u"), period.as("__p"))
    val cohorts = withPeriod.groupBy(col("__u"))
      .agg(min(col("__p")).as("cohort"))
    withPeriod.join(cohorts, "__u")
      .groupBy(col("cohort"), (col("__p") - col("cohort")).as("period_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
      .select(col("cohort"), col("period_offset"), col("n_users"))
  }

  /** Point-in-time (feature-store) join: each fact row enriched with the
    * [[scd2]] dimension version valid AT its timestamp — the training-
    * label correctness rule ("no feature leakage from the future") every
    * feature store enforces. NOT an interval theta-join (quadratic per
    * key, unrunnable at scale): because SCD2 intervals partition time
    * contiguously per key, the version valid at `ts` is simply the last
    * `valid_from <= ts`, i.e. an AS-OF join — one union + one window
    * carry-forward, one shuffle total ([[AsOf.asofJoin]]). Zero-width
    * versions (several transitions at one instant) resolve to the
    * highest version via the tiebreak, exactly matching the half-open
    * interval semantics an independent engine evaluates.
    *
    * @param history [[scd2]] output (or anything with `keyCol`,
    *                `valid_from`, `version`, and the payload columns)
    * @return all fact columns plus `attrCols` from the matching version
    *         (null when the fact predates every version)
    */
  def pointInTime(facts: DataFrame, history: DataFrame, keyCol: String,
                  factTs: String, attrCols: Seq[String]): DataFrame =
    AsOf.asofJoin(facts, history, keyCol, keyCol, factTs, "valid_from",
      payload = attrCols, tieBreak = Some("version"))

  /** Linear multi-touch attribution: every conversion splits one unit of
    * credit equally across its preceding touchpoints inside the lookback
    * window — the marketing-analytics counterpart of the last-touch
    * stream join ([[graft.streaming.Streaming]] attribution), here with
    * EVERY touch credited. Credit is integer MILLI-units (`1000 div n`
    * per touch, remainder to the most recent touch, ties to the larger
    * id), so per-touch sums are exact longs — order-independent and
    * engine-exact, the same determinism contract as the graph gates.
    *
    * Scale shape: pair generation rides [[RangeJoin.bandJoin]] (bucketed
    * equi-join, never an interval nested-loop); the per-conversion count
    * and remainder rank share ONE window partition (one shuffle on the
    * conversion id, width bounded by touches-per-window); the final
    * per-touch sum is a plain partial-aggregable groupBy.
    *
    * Inputs must carry distinct column names apart from `keyCol` (the
    * band join unions both schemas). Conversions with no touch in the
    * window credit nobody (inner band join).
    *
    * @return (touchId, credit_milli) — Σ over conversions, exact longs
    */
  def linearAttribution(conversions: DataFrame, touches: DataFrame,
                        keyCol: String, convTs: String, touchTs: String,
                        convId: String, touchId: String,
                        windowSeconds: Long): DataFrame = {
    // rename the touch-side key: same-name keys make Column.=== log a
    // spurious "trivially true equals predicate" WARN (the join itself
    // resolves correctly via the DataFrame-qualified references)
    val pairs = RangeJoin.bandJoin(conversions,
      touches.withColumnRenamed(keyCol, "__rkey"), keyCol, "__rkey",
      convTs, touchTs, before = windowSeconds, after = 0)
    val w = Window.partitionBy(col(convId))
    val wOrd = Window.partitionBy(col(convId))
      .orderBy(col(touchTs).desc, col(touchId).desc)
    pairs
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__credit",
        expr("1000 div __n") +
          when(col("__rn") === 1, expr("1000 % __n")).otherwise(lit(0L)))
      .groupBy(col(touchId))
      .agg(sum(col("__credit")).as("credit_milli"))
  }

  /** Pairwise co-occurrence mining (the market-basket / co-citation
    * primitive): for every basket (`basketCol`), every unordered item
    * pair that appears together, counted across baskets; the `topN`
    * heaviest pairs returned with a deterministic total order
    * (count desc, then item_a, item_b asc).
    *
    * Scale shape: the self-join key is the basket id, so fan-out per
    * basket is C(k,2) for k items — bounded whenever basket size is
    * bounded (TPC-H orders: ≤ 7 lineitems). The final top-N plans as
    * TakeOrderedAndProject: a per-partition bounded heap, never a full
    * sort. Unbounded baskets (a crawl domain with 10^6 docs) need a
    * per-basket item cap upstream — C(k,2) growth is quadratic and no
    * join strategy fixes that.
    */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   topN: Int = 20): DataFrame = {
    // Per-basket pair expansion instead of the basket self-join: ONE
    // basket-keyed aggregation builds each basket's distinct sorted item
    // list, pairs generate scan-side (codegen'd higher-order functions),
    // and one keyed count finishes — two shuffles total, where the
    // self-join paid the distinct plus two join-side exchanges of the
    // same rows. Identical output: array_sort's order IS the `<` the
    // join version compared with, so each unordered pair emerges exactly
    // once per containing basket. Fan-out is C(|basket|,2) either way —
    // a pathological hot basket needs the same upstream cap in both
    // shapes.
    // NULL-basket rows are excluded up front: the join shape this
    // replaces keyed on `__b === __b2`, and null equality never matches,
    // so a NULL basket contributed no pairs — groupBy would instead
    // treat NULL as a regular group and co-occur all its items. (NULL
    // items need no twin filter: collect_list drops nulls, matching the
    // join's null-never-compares `<`.)
    val baskets = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .filter(col("__b").isNotNull)
      .groupBy(col("__b"))
      .agg(array_sort(array_distinct(collect_list(col("__i")))).as("__xs"))
    val pairs = flatten(transform(col("__xs"), (x, i) =>
      transform(slice(col("__xs"), i + lit(2), size(col("__xs"))),
        y => struct(x.as("item_a"), y.as("item_b")))))
    baskets.select(explode(pairs).as("__p"))
      .select(col("__p.item_a").as("item_a"), col("__p.item_b").as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item_a"), col("item_b"))
      .limit(topN)
  }
}
