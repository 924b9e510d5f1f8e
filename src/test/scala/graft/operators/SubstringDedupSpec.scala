package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a shared run of length L >= k reconstructs exactly as one span") {
    // doc 1: tokens a0..a99; doc 2: b0..b19 ++ a10..a39 ++ c0..c19 —
    // shared run of 30 tokens at positions 20..49 of doc 2
    val shared = words("a", 100).slice(10, 40)
    val d1 = words("a", 100).mkString(" ")
    val d2 = (words("b", 20) ++ shared ++ words("c", 20)).mkString(" ")
    val spans = SubstringDedup.dupSpans(
        Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), "doc_id", "text",
        k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // owner is doc 1 (smaller id): only doc 2 gets a span, the FULL run
    assert(spans == Seq((2L, 20L, 49L, 30L)))
  }

  test("two disjoint shared runs stay two spans; adjacent windows merge") {
    val a = words("a", 200)
    // doc 2 carries a[0..19] at 0..19 and a[100..119] at 40..59
    val d2 = (a.slice(0, 20) ++ words("x", 20) ++ a.slice(100, 120)).mkString(" ")
    val spans = SubstringDedup.dupSpans(
        Seq((1L, a.mkString(" ")), (2L, d2)).toDF("doc_id", "text"),
        "doc_id", "text", k = 10)
      .orderBy($"span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq((2L, 0L, 19L, 20L), (2L, 40L, 59L, 20L)))
  }

  test("runs shorter than k are invisible; intra-doc repeats unmarked") {
    val a = words("a", 50)
    // doc 2 shares only 9 tokens (< k=10); doc 3 repeats ITS OWN block
    val d2 = (a.slice(0, 9) ++ words("y", 30)).mkString(" ")
    val d3 = (words("z", 15) ++ words("z", 15)).mkString(" ")
    val spans = SubstringDedup.dupSpans(
        Seq((1L, a.mkString(" ")), (2L, d2), (3L, d3))
          .toDF("doc_id", "text"), "doc_id", "text", k = 10)
      .collect()
    assert(spans.isEmpty)
  }

  test("removeSpans drops exactly the covered tokens, keeps untouched docs") {
    val a = words("a", 100)
    val d2 = (words("b", 20) ++ a.slice(10, 40) ++ words("c", 20)).mkString(" ")
    val d3 = words("q", 5).mkString(" ") // untouched, and too short to gram
    val df = Seq((1L, a.mkString(" ")), (2L, d2), (3L, d3))
      .toDF("doc_id", "text")
    val spans = SubstringDedup.dupSpans(df, "doc_id", "text", k = 10)
    val out = SubstringDedup.removeSpans(df, spans, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, String)].collect().toSeq
    assert(out(0) == ((1L, 100L, a.mkString(" "))))
    // doc 2 loses positions 20..49 (the shared run), keeps b* and c*
    assert(out(1) == ((2L, 40L,
      (words("b", 20) ++ words("c", 20)).mkString(" "))))
    assert(out(2) == ((3L, 5L, d3)))
    // a FULLY covered doc collapses to an empty row, not a missing one
    val full = Seq((1L, a.mkString(" ")),
      (4L, a.slice(0, 60).mkString(" "))).toDF("doc_id", "text")
    val fullSpans = SubstringDedup.dupSpans(full, "doc_id", "text", k = 50)
    val scrubbed = SubstringDedup.removeSpans(full, fullSpans, "doc_id", "text")
      .filter($"doc_id" === 4L).as[(Long, Long, String)].head()
    assert(scrubbed == ((4L, 0L, "")))
  }

  test("hashGrams=false (exact text) agrees with the hashed path") {
    val a = words("a", 120)
    val d2 = (words("b", 10) ++ a.slice(30, 90)).mkString(" ")
    val df = Seq((1L, a.mkString(" ")), (2L, d2)).toDF("doc_id", "text")
    val hashed = SubstringDedup.dupSpans(df, "doc_id", "text", k = 20)
      .orderBy($"doc_id", $"span_start").collect().toSeq
    val exact = SubstringDedup.dupSpans(df, "doc_id", "text", k = 20,
        hashGrams = false)
      .orderBy($"doc_id", $"span_start").collect().toSeq
    assert(hashed == exact && hashed.nonEmpty)
  }
}
