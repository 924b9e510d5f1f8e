package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The md5-family MinHash kernel must be BIT-EQUAL to the SQL form the
  * DuckDB oracle recomputes (`conv(substring(md5('i:' || s), 1, 15), 16,
  * 10)` per hash slot) — q_near_dup_audit hashes directly downstream of
  * it, so one divergent byte order or shift would silently break the
  * oracle gate while looking like a correct signature. */
class Md5MinhashSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** The reference construction: the exact HOF/conv chain the kernel
    * replaced, kept here as the executable specification. */
  private def referenceSig(sh: Column, numHashes: Int): Column = {
    def h(seed: Int, c: Column): Column =
      conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10).cast("long")
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => h(i, s)))): _*)
  }

  private val edgeCases = Seq(
    Seq("a"), Seq("a", "b", "c"), Seq("héllo wörld", "ß"),
    Seq("multi word shingle", "another one here"),
    Seq("emoji 🎉", "sur😀rogate pair"), Seq("x" * 300),
    Seq("0:", "1:", "15:"), // shingles that LOOK like seed prefixes
    (1 to 64).map(i => s"tok$i gram$i word$i"))

  test("kernel == conv/substring/md5 SQL form on edge-case shingle sets") {
    val df = edgeCases.toDF("sh")
    val diff = df.select(
        SketchExpressions.md5MinhashSignature(col("sh"), 32).as("fast"),
        referenceSig(col("sh"), 32).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0, diff.collect().mkString("; "))
  }

  test("kernel == SQL form on real corpus shingles, and at numHashes=8") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
      .select(array_distinct(
        graft.operators.Dedup.shingles(col("text"), 3)).as("sh"))
    val diff = docs.select(
        SketchExpressions.md5MinhashSignature(col("sh"), 8).as("fast"),
        referenceSig(col("sh"), 8).as("ref"))
      .filter(not(col("fast") === col("ref")))
    assert(diff.count() == 0)
  }

  test("empty shingle set yields the Long.MaxValue empty-signature") {
    val out = Seq(Seq.empty[String]).toDF("sh")
      .select(SketchExpressions.md5MinhashSignature(col("sh"), 4))
      .as[Seq[Long]].head()
    assert(out == Seq.fill(4)(Long.MaxValue))
  }
}
