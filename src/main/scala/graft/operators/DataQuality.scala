package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint checks a pipeline runs
  * against every ingested batch before letting it anywhere near training
  * (the reference encodes the same idea as per-field Zod/Prisma schema
  * validation on ingest, `src/db/schema.prisma` + the workflow input
  * guards; here the table-level generalization is a first-class query).
  *
  * Every check compiles into aggregate expressions over ONE Aggregate on
  * the audited frame — a single scan regardless of how many checks run,
  * with map-side partial aggregation for everything except exact
  * distinct counts. Exact [[DataQuality.Uniqueness]] adds one
  * count(DISTINCT) per checked column, which Spark plans via Expand (one
  * duplicated stream per distinct agg) — correct but k× the shuffle at k
  * exact-uniqueness checks, so at 100 TB the `approx = true` variant
  * (HyperLogLog++, still one pass, no Expand) is the production setting
  * and the exact form is the oracle-gated one.
  *
  * The audit result is one row per check: `check`, `column`,
  * `value` (the measured metric, rounded 6 dp), `threshold`, and
  * `passed` (= rounded value ≥ threshold). Metrics are ratios of exact
  * Long counts (or a single avg) so a SQL oracle replays them
  * bit-for-bit; an empty frame reports value 0 and fails every check
  * rather than emitting nulls — an audit over nothing must not pass.
  */
object DataQuality {

  /** One declarative constraint; `threshold` is the minimum passing value. */
  sealed trait Check {
    def name: String
    def column: String
    def threshold: Double
  }

  /** Fraction of non-null values in `column` (count(col)/count(*)). */
  final case class Completeness(column: String, threshold: Double)
      extends Check { val name = "completeness" }

  /** Distinct-to-total ratio of `column`; `approx` swaps the exact
    * count(DISTINCT) for approx_count_distinct (HLL++) — the scale
    * setting, not oracle-exact. */
  final case class Uniqueness(column: String, threshold: Double,
                              approx: Boolean = false)
      extends Check { val name = if (approx) "uniqueness_approx" else "uniqueness" }

  /** Fraction of rows satisfying `predicate` (nulls count as failing —
    * a compliance rule that cannot evaluate did not pass). */
  final case class Compliance(label: String, predicate: Column,
                              threshold: Double) extends Check {
    val name = "compliance"
    val column: String = label
  }

  /** Mean of `column` must be at least `threshold`. */
  final case class MeanAtLeast(column: String, threshold: Double)
      extends Check { val name = "mean_at_least" }

  /** Run all `checks` in one Aggregate pass; one result row per check,
    * ordered as given (the output carries `check`/`column` keys, so
    * callers gate on content, not order). */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      val e = c match {
        case Completeness(col0, _)       => count(col(col0)).cast("long")
        case Uniqueness(col0, _, false)  => count_distinct(col(col0)).cast("long")
        case Uniqueness(col0, _, true)   => approx_count_distinct(col(col0)).cast("long")
        case Compliance(_, p, _)         => sum(when(p, 1L).otherwise(0L))
        case MeanAtLeast(col0, _)        => avg(col(col0)).cast("double")
      }
      e.as(s"__m$i")
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val n = col("__n").cast("double")
    val rows = checks.zipWithIndex.map { case (c, i) =>
      val raw = c match {
        case _: MeanAtLeast => coalesce(col(s"__m$i").cast("double"), lit(0.0))
        case _ =>
          when(col("__n") > 0L,
            coalesce(col(s"__m$i").cast("double"), lit(0.0)) / n)
            .otherwise(lit(0.0))
      }
      val v = round(raw, 6)
      struct(lit(c.name).as("check"), lit(c.column).as("column"),
        v.as("value"), lit(c.threshold).as("threshold"),
        (v >= c.threshold).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Constraint SUGGESTION — the other half of the audit loop: profile
    * `cols` in one Aggregate pass and emit the checks the data currently
    * satisfies, as (column, check, threshold) rows a pipeline can review
    * and feed back into [[audit]]/[[monitor]] (Deequ's suggestion idea).
    * Suggested thresholds never exceed what the profiled data already
    * meets, so auditing the same frame against its own suggestions
    * passes by construction:
    *   - completeness: threshold 1.0 when fully populated, else the
    *     observed ratio floored to 2 dp (floor(100·obs)/100 — headroom
    *     for drift, and both engines floor the same double);
    *   - uniqueness 1.0: only when the column IS currently key-like;
    *   - min_at_least / max_at_most: observed bounds for numeric
    *     columns (cast to double once, at output).
    * Same scale shape as [[audit]]: one pass, count(DISTINCT) per
    * column via Expand — run it on a sample at 100 TB; suggestions are
    * advisory, the audit that enforces them is the exact pass. */
  def suggest(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "suggest needs at least one column")
    import org.apache.spark.sql.types.NumericType
    val numeric = cols.filter(c =>
      df.schema(c).dataType.isInstanceOf[NumericType]).toSet
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__c$i"), count_distinct(col(c)).as(s"__u$i")) ++
        (if (numeric(c))
          Seq(min(col(c)).cast("double").as(s"__mn$i"),
            max(col(c)).cast("double").as(s"__mx$i"))
        else Nil)
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val n = col("__n").cast("double")
    val rows = cols.zipWithIndex.flatMap { case (c, i) =>
      val obs = col(s"__c$i").cast("double") / n
      val completeness = struct(lit(c).as("column"),
        lit("completeness").as("check"),
        when(col(s"__c$i") === col("__n"), lit(1.0))
          .otherwise(floor(obs * 100.0) / 100.0).as("threshold"),
        (col("__n") > 0L).as("keep"))
      val uniqueness = struct(lit(c).as("column"),
        lit("uniqueness").as("check"), lit(1.0).as("threshold"),
        (col("__n") > 0L && col(s"__u$i") === col("__n")).as("keep"))
      val bounds = if (!numeric(c)) Nil else Seq(
        struct(lit(c).as("column"), lit("min_at_least").as("check"),
          col(s"__mn$i").as("threshold"), col(s"__mn$i").isNotNull.as("keep")),
        struct(lit(c).as("column"), lit("max_at_most").as("check"),
          col(s"__mx$i").as("threshold"), col(s"__mx$i").isNotNull.as("keep")))
      completeness +: uniqueness +: bounds
    }
    one.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
      .filter(col("keep")).drop("keep")
  }

  /** Quality firewall on a STREAM: audits every micro-batch with
    * [[audit]] and hands the per-batch result rows (leading `batch_id`
    * column) to `sink` — the monitor an ingest pipeline runs beside the
    * data path (append to a store audit table, alert on `passed =
    * false`) instead of discovering a silent producer change at training
    * time. `foreachBatch` + the checkpoint give the usual exactly-once
    * contract: a replayed batch re-presents the SAME batch_id, so an
    * idempotent sink (keyed on batch_id, like
    * [[graft.streaming]]'s StoreSink) audits each batch exactly once.
    * The audit itself is the same one-Aggregate pass per batch — cost
    * proportional to the batch, not the stream's history. */
  def monitor(stream: DataFrame, checks: Seq[Check], checkpointDir: String,
              trigger: org.apache.spark.sql.streaming.Trigger =
                org.apache.spark.sql.streaming.Trigger.AvailableNow())
             (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (b: DataFrame, bid: Long) =>
        sink(audit(b, checks)
          .select(lit(bid).as("batch_id"), col("check"), col("column"),
            col("value"), col("threshold"), col("passed")), bid)
        ()
      }
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .start()
}
