package graft.store

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: parse ∘ render is the identity on the sidecar stats model —
  * for any column names (quotes, backslashes, braces, unicode, control
  * chars), any value domain (long/double/string/boolean, including
  * extremes and negative zero), and any per-file breakdown. The format is
  * hand-rolled flat JSON; this is its safety net. */
class SliceStatsRoundtripSpec extends AnyFunSuite {
  import SliceStats._

  private val genName: Gen[String] = Gen.oneOf(
    Gen.identifier.map(_.take(20)).suchThat(_.nonEmpty),
    Gen.oneOf("col with spaces", "quote\"inside", "back\\slash",
      "tab\tsep", "uni·cødé", "newline\ninside", "a|b", // '|' w/o .parquet
      "{\"json\": 1}", "min", "max", "nulls"))
  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(x => x: Any),
    Gen.oneOf[Any](0.0d, -0.0d, 1.5d, -1e308, 4.9e-324,
      Double.MaxValue, 3.141592653589793d),
    Gen.oneOf[Any](true, false),
    Gen.asciiPrintableStr.map(s => (s.take(30)): Any),
    Gen.oneOf[Any]("", "s:looks-typed", "l:123", "\"{}\"", "a, \"b\": {c}"))

  // min/max share the value's TYPE (the format assumes one domain per col)
  private val genColStats: Gen[ColStats] = for {
    v1 <- genValue
    both <- Gen.oneOf(true, false)
    nulls <- Gen.option(Gen.chooseNum(0L, 1000000L))
  } yield ColStats(if (both) Some(v1) else None,
    if (both) Some(v1) else None, nulls)

  private val genCols: Gen[Map[String, ColStats]] =
    Gen.mapOf(Gen.zip(genName, genColStats)).map(_.take(6))

  private val genStats: Gen[Stats] = for {
    rows <- Gen.chooseNum(0L, 10000000L)
    cols <- genCols
    nFiles <- Gen.chooseNum(0, 3)
    files <- Gen.listOfN(nFiles, for {
      fn <- Gen.identifier.suchThat(_.nonEmpty)
        .map(n => s"part-${n.take(10)}.snappy.parquet")
      r <- Gen.chooseNum(0L, 100000L)
      cs <- genCols
    } yield fn -> FileStats(r, cs))
  } yield Stats(rows, cols, files.toMap)

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("render/parse roundtrip preserves every field") {
    checkProp(Prop.forAll(genStats) { st =>
      parseStats(render(st)).contains(st)
    })
  }

  test("parse is total on garbage (returns None, never throws)") {
    checkProp(Prop.forAll(Gen.asciiStr) { s =>
      parseStats(s); true
    })
  }

  test("wrapper-named columns degrade conservatively, not corruptly") {
    // a column literally named "cols"/"frows"/"fcols" collides with the
    // format's wrappers: it may be DROPPED from the parsed stats (the
    // reader then never prunes on it) but must not corrupt other columns
    val st = Stats(10L, Map(
      "frows" -> ColStats(Some(1L), Some(2L), Some(0L)),
      "id" -> ColStats(Some(5L), Some(9L), Some(1L))))
    val back = parseStats(render(st))
    assert(back.isDefined && back.get.cols.get("id")
      .contains(ColStats(Some(5L), Some(9L), Some(1L))))
  }
}
