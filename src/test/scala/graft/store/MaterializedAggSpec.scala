package graft.store

import graft.SparkTestBase
import graft.query.RawCol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance: delta-folded state stays bit-equal to a
  * from-scratch recompute through inserts, deletes, value updates, and
  * key-moving updates. */
class MaterializedAggSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("amount", DoubleType, nullable = true)))

  private def fresh(): (Catalog, GraftTable) = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-ivm").toString)
    (cat, new GraftTable(spark, cat, "jobs", schema,
      uniqueKeys = Seq(Seq("id"))))
  }

  private def normalized(df: DataFrame): Set[(String, Long, BigDecimal)] =
    df.select($"status", $"n", $"sum_amount")
      .as[(String, Long, BigDecimal)].collect().toSet

  test("delta-folded state equals recompute through a mutation storm") {
    val (cat, t) = fresh()
    t.createMany((1L to 40L).map(i =>
      (i, if (i % 3 == 0) "done" else "new", i * 1.5)).toDF("id", "status", "amount"))
    var state = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    var pin = cat.currentCommitId()

    // value update, key-moving update, delete, insert — one commit each
    t.updateMany(RawCol(col("id") <= 10L), Map("amount" -> lit(100.25)))
    t.updateMany(RawCol(col("id") % 5 === 0L), Map("status" -> lit("failed")))
    t.deleteMany(RawCol(col("id") > 35L))
    t.createMany(Seq((90L, "new", 9.75), (91L, "archived", 1.0))
      .toDF("id", "status", "amount"))

    val changes = ChangeFeed.changesBetween(t, pin, cat.currentCommitId())
    state = MaterializedAgg.applyDelta(state, changes, Seq("status"), Seq("amount"))
    val recomputed = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    assert(normalized(state) == normalized(recomputed))
  }

  test("NULL-keyed groups pair null-safely with their deltas") {
    val nullableSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("status", StringType, nullable = true),
      StructField("amount", DoubleType, nullable = true)))
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-ivm-null").toString)
    val t = new GraftTable(spark, cat, "jobs", nullableSchema,
      uniqueKeys = Seq(Seq("id")))
    t.createMany(Seq((1L, null, 5.0), (2L, null, 7.0), (3L, "a", 1.0))
      .toDF("id", "status", "amount"))
    var state = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    val pin = cat.currentCommitId()
    t.deleteMany(RawCol(col("id") === 1L))
    state = MaterializedAgg.applyDelta(state,
      ChangeFeed.changesBetween(t, pin, cat.currentCommitId()),
      Seq("status"), Seq("amount"))
    val recomputed = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    assert(normalized(state) == normalized(recomputed))
    assert(state.filter($"status".isNull).select($"n").as[Long].head() == 1L)
  }

  test("a group emptied by deletes drops out of the state") {
    val (cat, t) = fresh()
    t.createMany(Seq((1L, "only", 5.0), (2L, "keep", 1.0))
      .toDF("id", "status", "amount"))
    var state = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    val pin = cat.currentCommitId()
    t.deleteMany(RawCol(col("status") === "only"))
    val changes = ChangeFeed.changesBetween(t, pin, cat.currentCommitId())
    state = MaterializedAgg.applyDelta(state, changes, Seq("status"), Seq("amount"))
    assert(normalized(state).map(_._1) == Set("keep"))
  }

  test("all-NULL-measure groups report NULL sums, exactly as recompute") {
    val (cat, t) = fresh()
    t.createMany(Seq((1L, "ghost", None: Option[Double]),
        (2L, "ghost", None), (3L, "real", Some(4.0)))
      .toDF("id", "status", "amount"))
    var state = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    val pin = cat.currentCommitId()
    // a delta-born group whose only rows carry NULL measures must ALSO
    // come out NULL (this is the path that used to coalesce to 0.00)
    t.createMany(Seq((4L, "ghost2", None: Option[Double]))
      .toDF("id", "status", "amount"))
    t.deleteMany(RawCol(col("id") === 3L))
    state = MaterializedAgg.applyDelta(state,
      ChangeFeed.changesBetween(t, pin, cat.currentCommitId()),
      Seq("status"), Seq("amount"))
    val recomputed = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    val sums = state.select($"status", $"sum_amount")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(sums == Map("ghost" -> None, "ghost2" -> None))
    def rows(df: DataFrame) = df.select($"status", $"n", $"sum_amount", $"cnt_amount")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(2)).map(_.toString), r.getLong(3))).toSet
    assert(rows(state) == rows(recomputed))
  }

  test("legacy state without cnt columns still folds (migration path)") {
    val (cat, t) = fresh()
    t.createMany((1L to 20L).map(i => (i, if (i % 4 == 0) "x" else "y", i * 2.0))
      .toDF("id", "status", "amount"))
    // simulate a state materialized before cnt_<col> existed
    val legacy = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
      .drop("cnt_amount")
    val pin = cat.currentCommitId()
    t.deleteMany(RawCol(col("id") > 15L))
    t.createMany(Seq((30L, "x", 3.0)).toDF("id", "status", "amount"))
    val state = MaterializedAgg.applyDelta(legacy,
      ChangeFeed.changesBetween(t, pin, cat.currentCommitId()),
      Seq("status"), Seq("amount"))
    val recomputed = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    assert(normalized(state) == normalized(recomputed))
  }

  test("folding two commit ranges sequentially equals one combined fold") {
    val (cat, t) = fresh()
    t.createMany((1L to 10L).map(i => (i, "a", i * 2.0)).toDF("id", "status", "amount"))
    val s0 = MaterializedAgg.compute(t.snapshot(), Seq("status"), Seq("amount"))
    val c0 = cat.currentCommitId()
    t.updateMany(RawCol(col("id") <= 3L), Map("status" -> lit("b")))
    val c1 = cat.currentCommitId()
    t.deleteMany(RawCol(col("id") === 9L))
    val c2 = cat.currentCommitId()

    val stepped = MaterializedAgg.applyDelta(
      MaterializedAgg.applyDelta(s0,
        ChangeFeed.changesBetween(t, c0, c1), Seq("status"), Seq("amount")),
      ChangeFeed.changesBetween(t, c1, c2), Seq("status"), Seq("amount"))
    val combined = MaterializedAgg.applyDelta(s0,
      ChangeFeed.changesBetween(t, c0, c2), Seq("status"), Seq("amount"))
    assert(normalized(stepped) == normalized(combined))
  }
}
