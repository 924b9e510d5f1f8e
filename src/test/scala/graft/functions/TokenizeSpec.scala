package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The compiled tokenizer must be EXACTLY the regex form it replaces —
  * every oracle-checked text/dedup query hashes downstream of it, so a
  * single divergent token would silently flip sketch buckets. */
class TokenizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def regexTokens(c: org.apache.spark.sql.Column) =
    filter(split(lower(trim(c)), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  private val edgeCases = Seq(
    "", " ", "!!!", "a", " a ", "a b", "  a,b;c  ", "héllo wörld",
    "tab\tand\nnewline", "under_score-dash", "123 mixed42text",
    "Ⅷ roman", "½ fraction", "〇 ideograph", "ひらがな カタカナ",
    "emoji 🎉 party", "sur😀rogate", "ALL CAPS", "a" * 500,
    "trailing!", "!leading", "München STRASSE ß", "puncts...only???")

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
