package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parse-once-per-host robots.txt frontier composition — the shape
  * [[RobotsKernels]]'s scaladoc prescribes, made the operator: at crawl
  * scale the frontier is billions of URLs against millions of hosts, so
  * the robots parse MUST run on the deduped host frame (O(hosts)) and
  * the per-URL work must be only the match walk over the few selected
  * rules.
  *
  * Plan shape:
  *   1. `robots_rules(txt, agent)` evaluates on the robots-by-host frame
  *      — one parse+group-select per HOST, emitted as plain
  *      array<struct<allow, pattern>> data;
  *   2. the parsed frame joins the frontier on host (broadcast when the
  *      host table fits — millions of hosts × a handful of rules is
  *      low-GB, and the frontier side then never shuffles; pass
  *      `broadcastHosts = false` to fall back to a hash join keyed on
  *      host for a pathological rules table);
  *   3. `robots_decide(rules, path)` runs per frontier row — no parse,
  *      codegen'd match walk.
  *
  * A host absent from the robots table means "no robots.txt was
  * fetched" → everything allowed (the RFC's no-rules default): the join
  * is LEFT and a null rules array coalesces to empty.
  *
  * The parse-count contract (parses = O(hosts), not O(frontier rows))
  * is asserted by FrontierSpec via [[RobotsKernels.parseCalls]].
  *
  * Reference analog: the pipeline fetches sequentially with fixed 3 s
  * pacing and no robots consultation (src/runner/locator.ts:160); this
  * operator is what that loop becomes when the frontier is a table and
  * politeness is a per-host join, not per-fetch sleep.
  */
object Frontier {

  /** Annotate every frontier URL with its robots verdict for `agent`.
    *
    * @param frontier     any frame with an absolute-URL column
    * @param urlCol       the URL column name
    * @param robotsByHost (host, robots.txt text) — one row per host
    * @param hostCol      host column name in `robotsByHost`
    * @param txtCol       robots.txt text column name in `robotsByHost`
    * @return `frontier` plus `host`, `path`, `allowed`, `rule` (the
    *         winning rule's spelling, "" when none matched)
    */
  /** Turn [[politeFrontier]] verdicts into a per-host fetch SCHEDULE:
    * allowed URLs get a dense per-host fetch index (deterministic
    * `order` within the host) and a scheduled offset
    * `fetch_idx · max(delay_ms, 0)` — stride scheduling under the
    * host's own Crawl-delay (no delay declared → no pacing floor, the
    * scheduler's default). The window partitions on host, so state is
    * bounded by the largest single host's frontier, never the corpus.
    *
    * @param verdicts   [[politeFrontier]] output (or any frame with
    *                   `allowed`, the host column, and a delay column)
    * @param delayMsCol per-host crawl delay in millis (-1 = none)
    */
  def politeSchedule(verdicts: DataFrame, hostCol: String,
                     delayMsCol: String,
                     order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(hostCol)).orderBy(order: _*)
    verdicts.filter(col("allowed"))
      .withColumn("fetch_idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("scheduled_ms",
        col("fetch_idx") * greatest(col(delayMsCol), lit(0L)))
  }

  def politeFrontier(frontier: DataFrame, urlCol: String,
                     robotsByHost: DataFrame, hostCol: String,
                     txtCol: String, agent: String,
                     broadcastHosts: Boolean = true): DataFrame = {
    val R = RobotsExpressions
    val U = graft.functions.UrlExpressions
    val parsed = robotsByHost.select(
      col(hostCol).as("host"),
      R.robotsRules(col(txtCol), lit(agent)).as("__rules"))
    val hostSide = if (broadcastHosts) broadcast(parsed) else parsed
    val emptyRules =
      expr("CAST(array() AS array<struct<allow:boolean,pattern:string>>)")
    frontier
      .withColumn("host", U.urlHost(col(urlCol)))
      .withColumn("path", U.urlPath(col(urlCol)))
      .join(hostSide, Seq("host"), "left")
      .withColumn("__d", R.robotsDecide(
        coalesce(col("__rules"), emptyRules), col("path")))
      .withColumn("allowed", col("__d.allowed"))
      .withColumn("rule", col("__d.rule"))
      .drop("__rules", "__d")
  }
}
