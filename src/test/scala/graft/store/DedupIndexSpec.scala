package graft.store

import graft.SparkTestBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent MinHash-LSH dedup index: sketch-once/probe-forever,
  * CDF-incremental maintenance, config round-trip through the meta
  * table, and probe results identical to the inline operator. */
class DedupIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def text(i: Long): String =
    s"the quick document number $i talks about topic ${i % 7} " +
      s"with words ${i * 31 % 101} ${i * 17 % 89} and some shared filler"

  private def srcTable(): GraftTable = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-dedupidx").toString)
    new GraftTable(spark, cat, "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
  }

  private def triple(r: org.apache.spark.sql.Row): (Long, Seq[Long], Seq[Long]) =
    (r.getLong(0),
      Option(r.getSeq[Long](1)).map(s => s.toList: Seq[Long]).orNull,
      Option(r.getSeq[Long](2)).map(s => s.toList: Seq[Long]).orNull)

  private def sketchRows(t: GraftTable): Set[(Long, Seq[Long], Seq[Long])] =
    t.snapshot().collect().map(triple).toSet

  test("build persists sketches + config; refresh re-sketches only the delta") {
    val src = srcTable()
    src.createMany((1L to 50L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = DedupIndex.build(src, "d", "text", "doc_id", k = 3, numHashes = 32)
    assert(idx.config() == ((3, 32, 16)))
    // the persisted sketches equal the inline operator's output exactly
    def expect() = Dedup.minhashIndex(src.snapshot(), "text", "doc_id", 3, 32)
      .collect().map(triple).toSet
    assert(sketchRows(idx.sketch) == expect())

    src.createMany((51L to 60L).map(i => (i, text(i))).toDF("doc_id", "text"))
    src.updateMany(graft.query.RawCol(col("doc_id") === 7L),
      Map("text" -> lit(text(999L))))
    // a doc whose text goes NULL keeps a row but loses its sketch
    // identity (null sh/sig never band-collides) — the postimage
    // REPLACES the old sketch, so no stale identity survives
    src.updateMany(graft.query.RawCol(col("doc_id") === 9L),
      Map("text" -> lit(null).cast("string")))
    src.deleteMany(graft.query.RawCol(col("doc_id") > 45L && col("doc_id") <= 50L))
    assert(idx.refresh().nonEmpty)
    assert(idx.refresh().isEmpty, "caught up")
    assert(sketchRows(idx.sketch) == expect(),
      "CDF-refreshed sketches must equal a from-scratch re-sketch")
  }

  test("a refresh rewrites ONLY the buckets its delta ids hash into") {
    val src = srcTable()
    src.createMany((1L to 80L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = DedupIndex.build(src, "d", "text", "doc_id", nBuckets = 8)
    val before = src.catalog.manifest()(idx.sketch.name)
    assert(before.size == 8, s"expected 8 bucket slices, got ${before.size}")
    src.createMany(Seq((1000L, text(1000L))).toDF("doc_id", "text"))
    assert(idx.refresh().nonEmpty)
    val after = src.catalog.manifest()(idx.sketch.name)
    val moved = after.keySet.filter(kk => before.get(kk) != after.get(kk))
    assert(moved.size == 1,
      s"a one-doc delta must rewrite exactly one bucket slice, moved $moved")
  }

  test("a reopened handle probes under a NON-DEFAULT persisted family") {
    // the sketch-family params are private to the handle (config() is
    // store-internal): the only probe path reads the meta row, so a
    // build under k=4/numHashes=16 must be found by an open() that was
    // never told those values — a handle probing defaults instead would
    // band-join sketches of different widths and silently find nothing
    val src = srcTable()
    src.createMany((1L to 30L).map(i => (i, text(i))).toDF("doc_id", "text"))
    DedupIndex.build(src, "d", "text", "doc_id", k = 4, numHashes = 16)
    val got = DedupIndex.open(src, "d", "text", "doc_id")
      .dupsAgainst(Seq((100L, text(5L))).toDF("doc_id", "text"))
      .filter($"dup_of" === 5L)
      .select($"new_id", $"jaccard").as[(Long, Double)].collect().toMap
    assert(got(100L) == 1.0,
      "exact copy must pair at 1.0 under the persisted non-default family")
  }

  test("a reopened handle probes with the persisted config and finds near-dups") {
    val src = srcTable()
    src.createMany((1L to 40L).map(i => (i, text(i))).toDF("doc_id", "text"))
    DedupIndex.build(src, "d", "text", "doc_id")
    val idx = DedupIndex.open(src, "d", "text", "doc_id")
    // an exact copy and a lightly-edited near-dup of doc 5
    val batch = Seq(
      (100L, text(5L)),
      (101L, text(5L) + " extra tail word")).toDF("doc_id", "text")
    val got = idx.dupsAgainst(batch, threshold = 0.5)
      .filter($"dup_of" === 5L)
      .select($"new_id", $"jaccard").as[(Long, Double)].collect().toMap
    assert(got(100L) == 1.0, "exact copy pairs at jaccard 1.0")
    assert(got.get(101L).exists(j => j >= 0.5 && j < 1.0),
      s"edited twin pairs below 1.0, got ${got.get(101L)}")
  }
}
