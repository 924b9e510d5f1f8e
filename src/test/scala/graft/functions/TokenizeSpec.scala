package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compiled tokenizer must be EXACTLY the regex form it replaces —
  * every oracle-checked text/dedup query hashes downstream of it, so a
  * single divergent token would silently flip sketch buckets. */
class TokenizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // The CJK-aware regex reference: each CJK code point (Han ideographs,
  // Hiragana/Katakana — SketchKernels.isCjkChar's exact ranges) is its
  // own token; everything else tokenizes as maximal letter/number runs.
  // Expressed as one alternation so the kernel is checked against an
  // INDEPENDENT implementation of the same contract.
  private val CjkClass = "\\x{3040}-\\x{30FF}\\x{31F0}-\\x{31FF}" +
    "\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}" +
    "\\x{20000}-\\x{2EBEF}"
  private def regexTokens(c: org.apache.spark.sql.Column) =
    regexp_extract_all(lower(trim(c)),
      lit(s"([$CjkClass]|[[\\p{L}\\p{N}]&&[^$CjkClass]]+)"), lit(1))

  private val edgeCases = Seq(
    "", " ", "!!!", "a", " a ", "a b", "  a,b;c  ", "héllo wörld",
    "tab\tand\nnewline", "under_score-dash", "123 mixed42text",
    "Ⅷ roman", "½ fraction", "〇 ideograph", "ひらがな カタカナ",
    "emoji 🎉 party", "sur😀rogate", "ALL CAPS", "a" * 500,
    "trailing!", "!leading", "München STRASSE ß", "puncts...only???",
    // CJK: unsegmented runs explode per code point, mixed-script
    // boundaries flush the pending Latin run, Ext-B surrogate pairs
    // stay whole, Hangul stays run-based
    "中文测试", "日本語のテキスト", "mixed中文and英文words",
    "标点。中间", "数字42中文", "𠀀𠀁 extB", "한국어 단어", "中𠀀中")

  test("compiled tokenizer == regex tokenizer on edge cases") {
    val df = edgeCases.toDF("text")
    val diff = df.select(
        TextFunctions.tokens(col("text")).as("fast"),
        regexTokens(col("text")).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("compiled tokenizer == regex tokenizer on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val diff = docs.select(
        TextFunctions.tokens(col("text")).as("fast"),
        regexTokens(col("text")).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0)
  }

  test("tokenHashes == transform(xxhash64) and null-safety") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = TextFunctions.tokens(col("text"))
    val diff = docs.select(
        SketchExpressions.tokenHashes(toks).as("fast"),
        transform(toks, t => xxhash64(t)).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0)
    val nulls = Seq[Option[String]](None, Some("a b")).toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(SketchExpressions.tokenHashes(col("t")).as("h"))
      .collect()
    assert(nulls.count(_.isNullAt(0)) == 1)
  }
}
