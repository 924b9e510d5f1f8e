package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Planning-time file skipping through the scan relation: a PLAIN
  * `.filter` over [[GraftTable.snapshotRelation]] must prune at the
  * FileIndex (no snapshotWhere call anywhere), stay byte-identical to
  * the unpruned snapshot, and degrade to scan-everything whenever the
  * stats domain cannot prove a skip. */
class GraftFileIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def seeded(): GraftTable = {
    val t = new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-fi").toString),
      "events", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("bucket", StringType, nullable = false),
        StructField("score", DoubleType, nullable = true))),
      uniqueKeys = Seq(Seq("id")), partitionCols = Seq("bucket"))
    val rows = (0 until 4).flatMap { b =>
      (0 until 25).map { i =>
        (b * 100L + i, s"b$b",
          if (i % 7 == 0) None else Some(b * 1.0 + i / 100.0))
      }
    }
    t.createMany(rows.toDF("id", "bucket", "score"))
    t
  }

  test("filtered relation equals filtered snapshot for every filter shape") {
    val t = seeded()
    val preds = Seq(
      col("id") >= 100L && col("id") < 150L,
      col("bucket") === "b2",
      col("id").isin(5L, 105L, 205L, 305L),
      col("score").isNull,
      col("score").isNotNull && col("id") <= 110L,
      col("id") % 2 === 0) // not stats-prunable, must still be correct
    preds.foreach { p =>
      val a = t.snapshotRelation().filter(p)
        .orderBy("id").collect().toSeq
      val b = t.snapshot().filter(p)
        .orderBy("id").collect().toSeq
      assert(a == b, s"relation disagrees with snapshot under $p")
    }
  }

  test("a plain .filter prunes files at planning time") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    val got = df.filter(col("id") >= 100L && col("id") < 150L)
      .select("id").as[Long].collect().sorted
    assert(got.length == 25 && got.head == 100L && got.last == 124L)
    assert(idx.lastTotalFiles > 0)
    assert(idx.lastKeptFiles < idx.lastTotalFiles,
      s"expected skipping, kept ${idx.lastKeptFiles} of ${idx.lastTotalFiles}")
  }

  test("partition-value predicates prune like any other column") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    assert(df.filter(col("bucket") === "b3").count() == 25L)
    assert(idx.lastKeptFiles < idx.lastTotalFiles,
      "bucket is a sidecar column — its slices must prune")
  }

  test("unprovable conjuncts scan everything and still answer correctly") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    assert(df.filter(col("id") % 2 === 0).count() == 52L)
    assert(idx.lastKeptFiles == idx.lastTotalFiles,
      "stats cannot prove id % 2 — nothing may be skipped")
  }

  test("filters reach the parquet scan as PushedFilters") {
    val t = seeded()
    val plan = t.snapshotRelation().filter(col("id") >= 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,100)"),
      s"row-group pushdown missing from plan:\n$plan")
  }

  test("column pruning reaches the scan's ReadSchema") {
    val t = seeded()
    val plan = t.snapshotRelation().select("bucket")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("score"),
      s"2-column projection must not read score:\n$plan")
  }

  test("SQL WHERE over a registered view prunes through the same index") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    df.createOrReplaceTempView("graft_fi_events")
    val got = spark.sql(
      "SELECT id FROM graft_fi_events WHERE id >= 300 ORDER BY id")
      .as[Long].collect()
    assert(got.length == 25 && got.head == 300L)
    assert(idx.lastKeptFiles < idx.lastTotalFiles,
      "a SQL WHERE must reach the FileIndex exactly like a DataFrame filter")
  }

  test("the relation pins its snapshot across later commits") {
    val t = seeded()
    val pinned = t.snapshotRelation()
    t.deleteMany(graft.query.F.cmp("id", graft.query.CmpF(gte = Some(200L))))
    assert(pinned.count() == 100L, "pinned relation must not see the delete")
    assert(t.snapshotRelation().count() == 50L)
    // time-travel twin reads the pre-delete commit
    val c = t.catalog.currentCommitId()
    assert(t.snapshotRelationAt(c - 1).count() == 100L)
  }
}
