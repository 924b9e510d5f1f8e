package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join vs a brute-force in-memory reference on randomized data:
  * <= and < modes, tolerance, left semantics, partition independence. */
class AsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // (pid, key, time) probes / (qid, key, time, value) quotes — dense key
  // and time ranges force plenty of ties-in-key and interleavings.
  private val (probeRows, quoteRows) = {
    val rng = new scala.util.Random(7)
    val p = (0 until 300).map(i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(300).toLong))
    val q = (0 until 400).map(i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(300).toLong,
        rng.nextInt(1000) / 10.0))
    (p, q)
  }
  private lazy val probes = probeRows.toDF("pid", "k", "pt")
  private lazy val quotes = quoteRows.toDF("qid", "qk", "qt", "qv")

  /** Latest (time, qid)-max quote at-or-before (or strictly before) each
    * probe, same key — the semantics the operator must reproduce. */
  private def expected(strict: Boolean,
                       tol: Option[Long] = None): Map[Long, Option[Long]] =
    probeRows.map { case (pid, k, pt) =>
      val c = quoteRows.filter { case (_, qk, qt, _) =>
        qk == k && (if (strict) qt < pt else qt <= pt) &&
          tol.forall(t => pt - qt <= t)
      }
      pid -> (if (c.isEmpty) None
              else Some(c.maxBy { case (qid, _, qt, _) => (qt, qid) }._1))
    }.toMap

  private def run(strict: Boolean,
                  within: Option[Long] = None): Map[Long, Option[Long]] =
    AsOf.asofJoin(probes, quotes,
        probeKey = "k", quoteKey = "qk", probeTime = "pt", quoteTime = "qt",
        payload = Seq("qid", "qv"), tieBreak = Some("qid"),
        within = within.map(t => (p: org.apache.spark.sql.Column,
                                  q: org.apache.spark.sql.Column) => p - q <= t),
        strict = strict)
      .select($"pid", $"qid").as[(Long, Option[Long])].collect().toMap

  test("non-strict (<=) matches the brute-force reference") {
    val got = run(strict = false)
    assert(got.size == probeRows.size, "left join: every probe exactly once")
    assert(got == expected(strict = false))
  }

  test("strict (<) hides equal-time quotes") {
    assert(run(strict = true) == expected(strict = true))
    // the two modes genuinely differ on this data (equal times exist)
    assert(run(strict = true) != run(strict = false))
  }

  test("tolerance nulls out stale matches like merge_asof(tolerance=)") {
    assert(run(strict = false, within = Some(30L)) ==
      expected(strict = false, tol = Some(30L)))
  }

  test("payload fields come from the same quote row") {
    val got = AsOf.asofJoin(probes, quotes, "k", "qk", "pt", "qt",
        payload = Seq("qid", "qv"), tieBreak = Some("qid"))
      .select($"pid", $"qid", $"qv")
      .as[(Long, Option[Long], Option[Double])].collect()
    val byId = quoteRows.map(q => q._1 -> q._4).toMap
    got.foreach { case (pid, qid, qv) =>
      assert(qid.map(byId) == qv, s"probe $pid stitched fields across rows")
    }
  }

  test("output is independent of input partitioning") {
    val a = run(strict = false)
    val b = AsOf.asofJoin(probes.repartition(13), quotes.repartition(7),
        "k", "qk", "pt", "qt", Seq("qid"), tieBreak = Some("qid"))
      .select($"pid", $"qid").as[(Long, Option[Long])].collect().toMap
    assert(a == b)
  }

  test("bucketed (skew-proof) variant is equivalent to the plain plan") {
    // long epoch-second times so bucketOf's timestamp cast is exercised;
    // bucket width 40 s over a 300 s range → ~8 buckets, many empty per
    // key → the carry-in must jump gaps
    val got = AsOf.bucketedAsofJoin(probes, quotes,
        probeKey = "k", quoteKey = "qk", probeTime = "pt", quoteTime = "qt",
        payload = Seq("qid", "qv"), bucketSeconds = 40L,
        tieBreak = Some("qid"))
      .select($"pid", $"qid").as[(Long, Option[Long])].collect().toMap
    assert(got.size == probeRows.size)
    assert(got == expected(strict = false))
  }

  test("bucketed variant: hot key with every quote in one bucket-width") {
    // one key owns 2000 quotes in [0, 40) and probes across [0, 200) —
    // the plain plan would sort all 2000 in one partition; the bucketed
    // plan cuts it, and results must still match the brute force
    val hotQ = (0 until 2000).map(i => (i.toLong, 0L, (i % 40).toLong, i / 10.0))
    val hotP = (0 until 100).map(i => (i.toLong, 0L, (i * 2).toLong))
    val gotB = AsOf.bucketedAsofJoin(hotP.toDF("pid", "k", "pt"),
        hotQ.toDF("qid", "qk", "qt", "qv"),
        "k", "qk", "pt", "qt", Seq("qid"), bucketSeconds = 10L,
        tieBreak = Some("qid"))
      .select($"pid", $"qid").as[(Long, Option[Long])].collect().toMap
    val want = hotP.map { case (pid, _, pt) =>
      val c = hotQ.filter(_._3 <= pt)
      pid -> (if (c.isEmpty) None
              else Some(c.maxBy(q => (q._3, q._1))._1))
    }.toMap
    assert(gotB == want)
  }

  test("plan: one shuffle pass, no join operator, no range explosion") {
    val plan = AsOf.asofJoin(probes, quotes, "k", "qk", "pt", "qt",
        Seq("qid"), tieBreak = Some("qid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a quadratic join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"as-of is a window pass, not a join:\n$plan")
    assert(plan.contains("Window"), s"expected the carry-forward window:\n$plan")
  }
}
