package graft.store

import graft.SparkTestBase
import graft.query.RawCol
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Change data feed over the COW store: insert/delete/update
  * classification, byte-equal rewrites emitting nothing, and the
  * manifest-diff slice pruning. */
class ChangeFeedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-cdf").toString)

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("score", LongType, nullable = true)))

  private def table(cat: Catalog, parts: Seq[String] = Nil): GraftTable =
    new GraftTable(spark, cat, "jobs", schema,
      uniqueKeys = Seq(Seq("id")), partitionCols = parts)

  test("classifies inserts, deletes, and update image pairs") {
    val cat = freshCatalog()
    val t = table(cat)
    t.createMany(Seq((1L, "new", 10L), (2L, "new", 20L), (3L, "new", 30L))
      .toDF("id", "status", "score"))
    val c0 = cat.currentCommitId()
    t.updateMany(RawCol(col("id") === 2L), Map("score" -> lit(99L)))
    t.deleteMany(RawCol(col("id") === 3L))
    t.createMany(Seq((4L, "new", 40L)).toDF("id", "status", "score"))

    val got = ChangeFeed.changesBetween(t, c0, cat.currentCommitId())
      .select($"id", $"score", $"_change_type")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (2L, 20L, "update_preimage"), (2L, 99L, "update_postimage"),
      (3L, 30L, "delete"), (4L, 40L, "insert")))
  }

  test("byte-equal rows in a rewritten slice emit nothing") {
    val cat = freshCatalog()
    val t = table(cat)
    t.createMany(Seq((1L, "new", 10L), (2L, "new", 20L))
      .toDF("id", "status", "score"))
    val c0 = cat.currentCommitId()
    // the slice is rewritten (id=1 matched) but id=2 rides along unchanged
    t.updateMany(RawCol(col("id") === 1L), Map("score" -> lit(11L)))
    val got = ChangeFeed.changesBetween(t, c0, cat.currentCommitId())
      .select($"id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("no-op set to the same value is an empty feed") {
    val cat = freshCatalog()
    val t = table(cat)
    t.createMany(Seq((1L, "new", 10L)).toDF("id", "status", "score"))
    val c0 = cat.currentCommitId()
    t.updateMany(RawCol(col("id") === 1L), Map("score" -> lit(10L)))
    assert(ChangeFeed.changesBetween(t, c0, cat.currentCommitId()).count() == 0)
  }

  test("manifest diff prunes untouched slices of a partitioned table") {
    val cat = freshCatalog()
    val t = table(cat, parts = Seq("status"))
    t.createMany(Seq((1L, "new", 10L), (2L, "done", 20L), (3L, "failed", 30L))
      .toDF("id", "status", "score"))
    val c0 = cat.currentCommitId()
    t.updateMany(RawCol(col("id") === 1L), Map("score" -> lit(11L)))
    val changed = ChangeFeed.changedSliceKeys(t, c0, cat.currentCommitId())
    assert(changed.size == 1, changed)
    assert(changed.head.contains("new"), changed)
    val got = ChangeFeed.changesBetween(t, c0, cat.currentCommitId())
      .select($"id", $"_change_type").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "update_preimage"), (1L, "update_postimage")))
  }

  test("composite unique keys pair rows across versions") {
    val cat = freshCatalog()
    val t = new GraftTable(spark, cat, "shards", StructType(Seq(
      StructField("epoch", LongType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("state", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("epoch", "shard")))
    t.createMany(Seq((1L, 1L, "open"), (1L, 2L, "open"), (2L, 1L, "open"))
      .toDF("epoch", "shard", "state"))
    val pin = cat.currentCommitId()
    t.updateMany(RawCol(col("epoch") === 1L && col("shard") === 2L),
      Map("state" -> lit("sealed")))
    val got = ChangeFeed.changesBetween(t, pin, cat.currentCommitId())
      .select($"epoch", $"shard", $"state", $"_change_type")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, 2L, "open", "update_preimage"),
      (1L, 2L, "sealed", "update_postimage")))
  }

  test("null-keyed rows diff as a multiset: byte-equal emit nothing, changes emit delete+insert") {
    // nullable unique key — the store admits many NULL-keyed rows, which
    // have no pairing identity: a null-unsafe key join stranded
    // byte-identical rows into spurious delete+insert on every slice
    // rewrite
    val cat = freshCatalog()
    val t = new GraftTable(spark, cat, "leads", StructType(Seq(
      StructField("email", StringType, nullable = true),
      StructField("v", StringType, nullable = false))),
      uniqueKeys = Seq(Seq("email")))
    t.createMany(Seq((None: Option[String], "a"), (None, "b"), (Some("k1"), "c"))
      .toDF("email", "v"))
    val pin = cat.currentCommitId()
    t.updateMany(RawCol(col("v") === "b"), Map("v" -> lit("B")))
    val feed = ChangeFeed.changesBetween(t, pin, cat.currentCommitId())
      .select($"email", $"v", $"_change_type")
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getString(2))).toSet
    // (null, "a") is byte-equal in the rewritten slice → NO event;
    // (k1, "c") untouched → no event; (null, b→B) has no identity →
    // multiset delete+insert (update pairing is undefined without a key)
    assert(feed == Set((None, "b", "delete"), (None, "B", "insert")))
  }

  test("map-typed columns diff through canonical rendering (no EqualNullSafe crash)") {
    val cat = freshCatalog()
    val t = new GraftTable(spark, cat, "docs", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("attrs", MapType(StringType, StringType), nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    t.createMany(Seq(
      (1L, Map("a" -> "1", "b" -> "2")),
      (2L, Map("x" -> "9"))).toDF("id", "attrs"))
    val pin = cat.currentCommitId()
    t.updateMany(RawCol(col("id") === 2L),
      Map("attrs" -> map(lit("x"), lit("8"))))
    val feed = ChangeFeed.changesBetween(t, pin, cat.currentCommitId())
      .select($"id", $"_change_type").as[(Long, String)].collect().toSet
    // id 1's map is unchanged in the rewritten slice → nothing; id 2
    // emits the update pair (pre-fix: AnalysisException — <=> rejects maps)
    assert(feed == Set((2L, "update_preimage"), (2L, "update_postimage")))
  }

  test("feed across several commits composes (from table creation)") {
    val cat = freshCatalog()
    val t = table(cat)
    val c0 = cat.currentCommitId() // before any data
    t.createMany(Seq((1L, "new", 10L)).toDF("id", "status", "score"))
    t.updateMany(RawCol(col("id") === 1L), Map("status" -> lit("done")))
    val got = ChangeFeed.changesBetween(t, c0, cat.currentCommitId())
      .select($"id", $"status", $"_change_type")
      .as[(Long, String, String)].collect().toSet
    // the net change since c0 is one insert carrying the final state
    assert(got == Set((1L, "done", "insert")))
  }
}
