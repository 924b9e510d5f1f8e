package graft.store

import graft.SparkTestBase
import graft.operators.Dedup
import graft.query.RawCol
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The change feed drives incremental near-dup maintenance: after a
  * commit, only the feed's inserted/updated documents are re-sketched
  * against the prebuilt corpus index — the 100 TB composition where a
  * dedup pass costs the commit's delta, not a corpus rescan. Pinned
  * equal to a full-recompute pair set. */
class CdfDedupCompositionSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  test("CDF delta re-sketch equals full recompute after a commit") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-cdfdedup").toString)
    val t = new GraftTable(spark, cat, "docs", schema,
      uniqueKeys = Seq(Seq("doc_id")))
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "pack my box with five dozen liquor jugs right now"),
      (3L, "sphinx of black quartz judge my vow completely"))
    t.createMany(base.toDF("doc_id", "text"))
    val index = Dedup.minhashIndex(t.snapshot(), "text", "doc_id")
    val pin = cat.currentCommitId()

    // commit: one near-dup insert, one edit that BECOMES a near-dup of 2
    t.createMany(Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text"))
    t.updateMany(RawCol(col("doc_id") === 3L),
      Map("text" -> lit("pack my box with five dozen liquor jugs right here")))

    val changes = ChangeFeed.changesBetween(t, pin, cat.currentCommitId())
    val touched = changes
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("doc_id"), col("text"))
    // delta path: only the touched docs sketch against the stale index
    // minus their own stale entries (an updated doc must not match its
    // pre-image sketch)
    val staleIds = touched.select(col("doc_id").as("id"))
    val prunedIndex = index.join(staleIds, Seq("id"), "left_anti")
    val incr = Dedup.minhashIncremental(prunedIndex, touched, "text", "doc_id")
      .select($"new_id", $"dup_of").as[(Long, Long)].collect().toSet

    // full path: rebuild pairs over the live snapshot, restricted to the
    // same "new vs rest" question
    val touchedIds = Set(10L, 3L)
    val fullPairs: Set[(Long, Long)] = Dedup.minhashLshPairsPortable(
        t.snapshot(), "text", "doc_id", threshold = 0.7)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val full = fullPairs
      .filter(p => touchedIds.contains(p._1) || touchedIds.contains(p._2))
      .map(p => if (touchedIds.contains(p._2)) (p._2, p._1) else p)

    assert(incr.nonEmpty, "planted near-dups must be found")
    assert(incr == full, s"incr=$incr full=$full")
  }
}
