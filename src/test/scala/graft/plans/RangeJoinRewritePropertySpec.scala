package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: for ANY points, intervals (including empty, inverted, and
  * NULL-bounded), bucket width, and bound strictness, the rewritten plan
  * returns exactly the pairs a driver-side reference evaluation of the
  * original predicate produces. An optimizer rule's failure mode is
  * silent wrong answers on shapes nobody hand-tested — negative values
  * around bucket boundaries, zero-length intervals, widths far larger or
  * smaller than the data spread — so the net is randomized. */
class RangeJoinRewritePropertySpec extends AnyFunSuite with SparkTestBase {

  // values cluster near bucket-boundary multiples and include negatives —
  // floor-division's classic off-by-one territory
  private val genVal: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(-500L, 500L),
    Gen.chooseNum(-5L, 5L).map(_ * 97L),
    Gen.oneOf(0L, -1L, 1L, 96L, 97L, 98L, -97L, -96L, -98L))

  // translation bases that push the whole trial to the extremes where a
  // double floor-division goes inexact: both sides of ±2^53 (the exact
  // defect the integer floor-div fix closes — a lost pair there was
  // silent), ±2^62, and within a few thousand of the Long endpoints
  private val genBase: Gen[Long] = Gen.oneOf(
    0L, 0L, 0L, // keep the original small-domain coverage dominant
    (1L << 53) - 400L, -(1L << 53) - 400L,
    1L << 62, -(1L << 62),
    Long.MaxValue - 4000L, Long.MinValue + 4000L)

  private case class Trial(points: List[Long], ivals: List[(Long, Long)],
                           nullPoints: Int, nullLos: Int,
                           width: Long, strictLo: Boolean, strictHi: Boolean)

  private val genTrial: Gen[Trial] = for {
    base <- genBase
    points <- Gen.listOfN(40, genVal)
    los <- Gen.listOfN(25, genVal)
    spans <- Gen.listOfN(25, Gen.chooseNum(-50L, 300L)) // negative = inverted
    nullPoints <- Gen.chooseNum(0, 3)
    nullLos <- Gen.chooseNum(0, 3)
    width <- Gen.oneOf(1L, 7L, 97L, 1000L, 100000L)
    strictLo <- Gen.oneOf(true, false)
    strictHi <- Gen.oneOf(true, false)
  } yield Trial(points.map(_ + base),
    los.zip(spans).map { case (lo, s) => (base + lo, base + lo + s) },
    nullPoints, nullLos, width, strictLo, strictHi)

  test("rewritten interval join equals driver-side reference on random shapes") {
    val s = spark.newSession()
    RangeJoinRewrite.install(s)
    import s.implicits._

    val prop = Prop.forAll(genTrial) { tr =>
      s.conf.set(RangeJoinRewrite.WidthConf, tr.width.toString)
      val pts = tr.points.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (i < tr.nullPoints) null else (t: java.lang.Long))
      }
      val ivs = tr.ivals.zipWithIndex.map { case ((lo, hi), i) =>
        (1000L + i, if (i < tr.nullLos) null else (lo: java.lang.Long),
          (hi: java.lang.Long))
      }
      val pdf = pts.toDF("pid", "t")
      val idf = ivs.toDF("iid", "lo", "hi")
      val loCond = if (tr.strictLo) col("t") > col("lo") else col("t") >= col("lo")
      val hiCond = if (tr.strictHi) col("t") < col("hi") else col("t") <= col("hi")
      val got = pdf.join(idf, loCond && hiCond)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      val expect = (for {
        (pid, t) <- pts if t != null
        (iid, lo, hi) <- ivs if lo != null
        okLo = if (tr.strictLo) t > lo else t >= lo
        okHi = if (tr.strictHi) t < hi else t <= hi
        if okLo && okHi
      } yield (pid, iid)).toSet

      val pass = got == expect
      if (!pass) println(s"MISMATCH width=${tr.width} strict=(${tr.strictLo},${tr.strictHi}) " +
        s"missing=${expect -- got} extra=${got -- expect}")
      pass
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
