package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The parse-once-per-host contract of [[Frontier.politeFrontier]]: the
  * robots parse count is O(hosts), never O(frontier rows), and the
  * composition reproduces exactly the per-row `robots_eval` decisions. */
class FrontierSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val Hosts = 7
  private val Rows = 20000L

  private def frontier = spark.range(Rows).select(
    col("id"),
    concat(lit("https://h"), pmod(col("id"), lit(Hosts)),
      lit(".example"),
      when(pmod(col("id"), lit(3)) === 0,
        concat(lit("/private/doc-"), col("id")))
        .when(pmod(col("id"), lit(3)) === 1,
          concat(lit("/pub/doc-"), col("id")))
        .otherwise(concat(lit("/files/doc-"), col("id"), lit(".pdf"))))
      .as("url"))

  private def robots = spark.range(Hosts).select(
    concat(lit("h"), col("id"), lit(".example")).as("host"),
    concat(lit("User-agent: graftbot\nDisallow: /private/\n" +
      "Disallow: /*.pdf$\nAllow: /private/doc-"), col("id") * 3,
      lit("$\n")).as("robots_txt"))

  test("robots parse count is O(hosts), not O(frontier rows)") {
    val before = RobotsKernels.parseCalls.sum()
    val out = Frontier.politeFrontier(frontier, "url", robots,
      "host", "robots_txt", agent = "GraftBot/1.0").collect()
    val parses = RobotsKernels.parseCalls.sum() - before
    assert(out.length == Rows)
    // one parse per host-side row evaluation; allow generous slack for
    // plan re-evaluation (broadcast build + a possible re-run), but the
    // bound must sit orders of magnitude under the frontier row count
    assert(parses <= 8L * Hosts,
      s"parse count $parses exceeds O(hosts) bound (${8 * Hosts})")
    assert(parses < Rows / 100,
      s"parse count $parses is frontier-shaped, not host-shaped")
  }

  test("composition matches per-row robots_eval decisions exactly") {
    val R = RobotsExpressions
    val U = graft.functions.UrlExpressions
    val viaFrontier = Frontier.politeFrontier(frontier, "url", robots,
      "host", "robots_txt", agent = "GraftBot/1.0")
      .select(col("id"), col("allowed"), col("rule"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      .sortBy(_._1)
    val perRow = frontier
      .withColumn("host", U.urlHost(col("url")))
      .join(broadcast(robots), Seq("host"))
      .select(col("id"), R.robotsEval(col("robots_txt"),
        lit("GraftBot/1.0"), U.urlPath(col("url"))).as("d"))
      .select(col("id"), col("d.allowed"), col("d.rule"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      .sortBy(_._1)
    assert(viaFrontier.sameElements(perRow))
    // spot-check the planted semantics: /private/ blocked, the id*3
    // anchored allow punches through, .pdf blocked, /pub allowed
    val byId = viaFrontier.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(3L) == ((false, "/private/")))   // host h3, /private/doc-3
    assert(byId(1L) == ((true, "")))             // /pub
    assert(byId(2L) == ((false, "/*.pdf$")))     // .pdf
  }

  test("a host with no robots row is fully allowed (left join, RFC default)") {
    val partial = robots.filter(col("host") =!= "h0.example")
    val out = Frontier.politeFrontier(frontier, "url", partial,
      "host", "robots_txt", agent = "GraftBot/1.0")
      .filter(col("host") === "h0.example")
      .select(col("allowed"), col("rule")).distinct().collect()
    assert(out.length == 1)
    assert(out(0).getBoolean(0) && out(0).getString(1) == "")
  }

  test("politeSchedule: dense per-host index, stride offsets, -1 delay floors at 0") {
    val verdicts = Seq(
      (1L, "h0", true, 2000L), (3L, "h0", true, 2000L),
      (5L, "h0", false, 2000L), (7L, "h0", true, 2000L),
      (2L, "h1", true, -1L), (4L, "h1", true, -1L))
      .toDF("id", "host", "allowed", "delay_ms")
    val out = Frontier.politeSchedule(verdicts, "host", "delay_ms",
      Seq(col("id")))
      .select(col("id"), col("host"), col("fetch_idx"), col("scheduled_ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._2, t._3))
    // disallowed id=5 is skipped and the index stays DENSE (7 gets 2);
    // h1's undeclared delay (-1) schedules everything at 0
    assert(out.toSeq == Seq(
      (1L, "h0", 0L, 0L), (3L, "h0", 1L, 2000L), (7L, "h0", 2L, 4000L),
      (2L, "h1", 0L, 0L), (4L, "h1", 1L, 0L)))
  }

  test("urlPath: path+query for robots matching, fragment dropped") {
    import graft.functions.UrlKernels.pathOf
    assert(pathOf("https://h.example/a/b?x=1#frag") == "/a/b?x=1")
    assert(pathOf("https://h.example") == "/")
    assert(pathOf("https://h.example?q=1") == "/?q=1")
    assert(pathOf("https://h.example#frag") == "/")
    assert(pathOf("not-a-url") == null)
  }
}
