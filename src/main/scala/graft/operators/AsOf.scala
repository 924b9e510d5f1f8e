package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join.
  *
  * For every probe row, attach the payload of the latest quote row sharing
  * its key whose time is `<=` (or `<` when `strict`) the probe's time —
  * the "state as of this moment" shape (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`, kdb `aj`). Spark has no native operator for it, and the
  * naive formulation — a theta-join on `quote.t <= probe.t` plus a
  * per-probe argmax — plans a broadcast-nested-loop or cartesian product:
  * quadratic per key, unrunnable at 100 TB.
  *
  * Plan here: tag both inputs, union them, and make ONE window pass
  * partitioned by key and ordered by (time, side, tiebreak):
  * `last(payload_struct, ignoreNulls)` over rows-unbounded-preceding
  * carries the most recent quote forward onto each probe row. Cost is a
  * single hash shuffle of |probes| + |quotes| rows and a per-key sort —
  * the same shape as one sort-merge join, with no range explosion and no
  * per-probe scan. The payload rides in one struct so every carried column
  * comes from the SAME quote row (per-column `last` could stitch fields
  * from different rows when payload fields are legitimately null).
  *
  * Determinism: quote-time ties are broken by `tieBreak` ascending — the
  * greatest tiebreak value wins — so output is engine- and
  * partitioning-independent.
  *
  * Scale notes: one hot key (a user with tens of millions of quotes)
  * serializes into a single partition's sort; the remedy is the usual
  * time-sliced carry-in (as-of join per coarse time bucket, then carry the
  * last quote of bucket i into bucket i+1), which composes from this same
  * operator. Both inputs keep their scan-level filters and pruned schemas —
  * nothing here blocks pushdown.
  */
object AsOf {

  /** Left as-of join: all probe columns plus `payload` columns from the
    * matching quote (null when no quote precedes the probe).
    *
    * @param probes    left side; every row appears exactly once in the output
    * @param quotes    right side; `payload` names its carried columns
    * @param within    optional tolerance predicate `(probeTime, quoteTime) =>
    *                  boolean` — a match older than the tolerance yields
    *                  nulls, as in pandas `merge_asof(tolerance=...)`
    * @param strict    true = `quote.t < probe.t` (an equal-time quote is
    *                  invisible); false = `<=`
    */
  def asofJoin(
      probes: DataFrame, quotes: DataFrame,
      probeKey: String, quoteKey: String,
      probeTime: String, quoteTime: String,
      payload: Seq[String],
      tieBreak: Option[String] = None,
      within: Option[(Column, Column) => Column] = None,
      strict: Boolean = false): DataFrame = {

    // SQL-join semantics for the output shape: a payload name colliding
    // with a probe column would silently emit duplicate column names
    // (ambiguous downstream, invalid parquet schema) — pandas merge_asof
    // suffixes; here the caller must alias first.
    payload.filter(probes.columns.contains).foreach { c =>
      throw new IllegalArgumentException(
        s"asofJoin: payload column $c collides with a probe column — alias it")
    }

    // Sort order at equal time decides <= vs <: under <= the quote must be
    // visible to the probe, so quotes sort first; under < probes sort first.
    val (quoteSide, probeSide) = if (strict) (1, 0) else (0, 1)

    // NULL keys never match (SQL/pandas/DuckDB as-of semantics): the
    // partition window would otherwise group null-keyed quotes WITH
    // null-keyed probes and enrich them with each other's payloads. A
    // null-TIMED quote is equally unmatchable (it would sort first and be
    // carried into every probe of its key). Null-keyed/timed PROBES stay —
    // they emit with null payload like any unmatched probe.
    val qClean = quotes.filter(col(quoteKey).isNotNull && col(quoteTime).isNotNull)

    // Quote time travels inside the struct so `within` can see it.
    val qStruct = struct(
      (col(quoteTime).as("__qt") +: payload.map(col)): _*)
    val qSel = qClean.select(
      col(quoteKey).as("__k"), col(quoteTime).as("__t"),
      (tieBreak.map(col).getOrElse(lit(0L))).as("__tb"),
      lit(quoteSide).as("__side"), qStruct.as("__q"))

    val pStruct = struct(probes.columns.map(col): _*)
    val qType = qSel.schema("__q").dataType
    val tbType = qSel.schema("__tb").dataType
    val pSel0 = probes.select(
      col(probeKey).as("__k"), col(probeTime).as("__t"),
      lit(null).cast(tbType).as("__tb"),
      lit(probeSide).as("__side"), lit(null).cast(qType).as("__q"),
      pStruct.as("__p"))
    val pType = pSel0.schema("__p").dataType

    val unioned = pSel0.unionByName(
      qSel.withColumn("__p", lit(null).cast(pType)))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__last", last(col("__q"), ignoreNulls = true).over(w))
      .filter(col("__side") === probeSide)

    val matched = within match {
      case Some(pred) =>
        when(col("__last").isNotNull &&
          pred(col("__t"), col("__last").getField("__qt")), col("__last"))
      case None => col("__last")
    }
    val probeCols = probes.columns.map(c => col("__p").getField(c).as(c))
    val payloadCols = payload.map(c => matched.getField(c).as(c))
    carried.select(probeCols ++ payloadCols: _*)
  }

  /** Skew-proof as-of join: the time-sliced composition [[asofJoin]]'s
    * scaladoc promises. A hot key (one user with 100 M quotes) serializes
    * the plain plan into a single partition's sort; here both sides are
    * cut into `bucketSeconds`-wide time slices so the window partitions on
    * (key, bucket) — the hot key spreads across its time range — and
    * correctness across slice boundaries comes from CARRY-IN rows: each
    * (key, bucket)'s last quote is forward-filled (one tiny window over
    * the per-bucket-last table, one row per key×bucket, NOT per quote)
    * into the next occupied probe bucket it must seed.
    *
    * Semantics are identical to `asofJoin(strict = false)` with the same
    * tiebreak — spec-asserted by equivalence on randomized data. Times
    * must be castable to timestamp (epoch seconds drive the slicing).
    *
    * Cost: one shuffle of probes+quotes on (key, bucket) + one shuffle of
    * the per-bucket-last summary — 2 shuffles total, each with bounded
    * partitions, vs 1 unbounded-partition shuffle for the plain plan. Use
    * this form when a key's quotes outgrow one executor's sort budget.
    */
  def bucketedAsofJoin(
      probes: DataFrame, quotes: DataFrame,
      probeKey: String, quoteKey: String,
      probeTime: String, quoteTime: String,
      payload: Seq[String],
      bucketSeconds: Long,
      tieBreak: Option[String] = None): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // same contracts as asofJoin: no payload/probe name collisions, and
    // null-keyed/null-timed quotes are unmatchable
    payload.filter(probes.columns.contains).foreach { c =>
      throw new IllegalArgumentException(
        s"bucketedAsofJoin: payload column $c collides with a probe column — alias it")
    }
    val qClean = quotes.filter(col(quoteKey).isNotNull && col(quoteTime).isNotNull)

    def bucketOf(c: Column): Column =
      floor(c.cast("timestamp").cast("double") / lit(bucketSeconds.toDouble))
        .cast("long")

    // Probe buckets this key actually occupies — carry rows only need to
    // land where a probe can see them.
    val probeBuckets = probes
      .select(col(probeKey).as("__k"), bucketOf(col(probeTime)).as("__b"))
      .distinct()

    // Last quote of each (key, quote-bucket): ONE row per key×bucket.
    val qTagged = qClean.select(
      col(quoteKey).as("__k"), col(quoteTime).as("__t"),
      bucketOf(col(quoteTime)).as("__b"),
      tieBreak.map(col).getOrElse(lit(0L)).as("__tb"),
      struct((col(quoteTime).as("__qt") +: payload.map(col)): _*).as("__q"))
    val lastPerBucket = qTagged
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__k"), col("__b"))
          .orderBy(col("__t").desc, col("__tb").desc)))
      .filter(col("__rn") === 1).drop("__rn")

    // Forward-fill each bucket-last into the NEXT occupied probe buckets:
    // union quote-bucket summaries with probe buckets, run last() over
    // bucket order — the same union+window trick one level up, on the
    // tiny summary table. Probe rows sort BEFORE the same bucket's quote
    // summary (side 0 < 1) and the frame ends at -1, so a probe bucket's
    // seed comes strictly from EARLIER buckets — its own bucket's quotes
    // participate directly in the intra-bucket pass below.
    val summaryW = Window.partitionBy(col("__k"))
      .orderBy(col("__b").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carrySeeds = lastPerBucket
      .select(col("__k"), col("__b"), lit(1).as("__side"), col("__q"))
      .unionByName(probeBuckets.withColumn("__side", lit(0))
        .withColumn("__q", lit(null).cast(
          qTagged.schema("__q").dataType)))
      .withColumn("__carry", last(col("__q"), ignoreNulls = true).over(summaryW))
      .filter(col("__side") === 0 && col("__carry").isNotNull)
      // the seed re-enters the bucket pass at its TRUE quote time, which
      // is strictly older than the bucket's open — it sorts first
      .select(col("__k"), col("__b"),
        col("__carry").getField("__qt").as("__t"), col("__carry").as("__q"))

    // Intra-bucket pass: quotes of the bucket + carry seed + probes.
    val pTagged = probes.select(
      col(probeKey).as("__k"), bucketOf(col(probeTime)).as("__b"),
      col(probeTime).as("__t"),
      lit(null).cast(qTagged.schema("__tb").dataType).as("__tb"),
      lit(2).as("__side"),
      lit(null).cast(qTagged.schema("__q").dataType).as("__q"),
      struct(probes.columns.map(col): _*).as("__p"))
    val pType = pTagged.schema("__p").dataType
    val inBucket = pTagged
      .unionByName(qTagged.withColumn("__side", lit(1))
        .withColumn("__p", lit(null).cast(pType)))
      .unionByName(carrySeeds
        .withColumn("__tb", lit(null).cast(qTagged.schema("__tb").dataType))
        .withColumn("__side", lit(0))
        .withColumn("__p", lit(null).cast(pType)))

    // Order inside a bucket: the carry seed's true time predates the
    // bucket open, so plain (time, side, tiebreak) puts it first; at
    // equal time quotes (1) sort before probes (2) for <= semantics;
    // quote ties break by tiebreak ascending (last wins).
    val bwOrdered = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = inBucket
      .withColumn("__last", last(col("__q"), ignoreNulls = true).over(bwOrdered))
      .filter(col("__side") === 2)
    val probeCols = probes.columns.map(c => col("__p").getField(c).as(c))
    val payloadCols = payload.map(c => col("__last").getField(c).as(c))
    carried.select(probeCols ++ payloadCols: _*)
  }
}
