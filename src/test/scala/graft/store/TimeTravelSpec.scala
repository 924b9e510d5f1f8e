package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-pinned snapshots: every commit archives its manifest, readers
  * can reproduce the table as of any commit id until vacuum reclaims the
  * superseded slice versions. */
class TimeTravelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def table(): GraftTable =
    new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-tt").toString),
      "t", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))

  test("snapshotAt reproduces each commit exactly") {
    val t = table()
    assert(t.catalog.currentCommitId() == 0L)
    t.createMany(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val c1 = t.catalog.currentCommitId()
    t.updateMany(graft.query.RawCol(col("id") === 1L), Map("v" -> lit("A")))
    val c2 = t.catalog.currentCommitId()
    t.deleteMany(graft.query.RawCol(col("id") === 2L))
    val c3 = t.catalog.currentCommitId()
    assert(c1 < c2 && c2 < c3)

    def rows(id: Long): Set[(Long, String)] =
      t.snapshotAt(id).select($"id", $"v").as[(Long, String)].collect().toSet
    assert(rows(c1) == Set((1L, "a"), (2L, "b")))
    assert(rows(c2) == Set((1L, "A"), (2L, "b")))
    assert(rows(c3) == Set((1L, "A")))
    assert(t.snapshot().count() == 1)
  }

  test("unknown commit id raises the P2025 equivalent") {
    val t = table()
    t.createMany(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[RecordNotFoundException](t.snapshotAt(99L))
    assert(e.code == "P2025")
  }

  test("pinned snapshots survive later commits until vacuum; vacuum(0) reclaims") {
    val t = table()
    t.createMany(Seq((1L, "a")).toDF("id", "v"))
    val pin = t.catalog.currentCommitId()
    t.updateMany(graft.query.RawCol(col("id") === 1L), Map("v" -> lit("z")))
    // superseded version still on disk → pinned read works
    assert(t.snapshotAt(pin).select($"v").as[String].head() == "a")
    t.catalog.vacuum(0)
    // current snapshot intact; the pinned version's files are gone
    assert(t.snapshot().select($"v").as[String].head() == "z")
    // The DELIBERATELY failing read below makes Spark's own execution-
    // listener plumbing touch the failed query's lazy plan and rethrow
    // the AnalysisException, which ExecutionListenerBus logs at ERROR —
    // in a GREEN suite, which trains people to ignore ERRORs. Silence
    // that one logger for the one intentional failure, then restore.
    // (Deregistering listeners instead would break the session's
    // Observation machinery for every later test.)
    val lbLogger = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.util.ExecutionListenerBus")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val prevLevel = lbLogger.getLevel
    lbLogger.setLevel(org.apache.logging.log4j.Level.FATAL)
    // the read may fail at plan time (missing dir) or at execution — both
    // are acceptable; serving CURRENT data under the old pin would not be
    val stale =
      try scala.util.Try(t.snapshotAt(pin).count())
      finally {
        // the ERROR is posted from an ASYNC bus thread — give it a beat
        // before restoring the level
        Thread.sleep(500)
        lbLogger.setLevel(prevLevel)
      }
    assert(stale.isFailure || stale.get == 0,
      "vacuumed pin must not silently serve current data")
  }

  test("multi-table transaction archives ONE commit covering both tables") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-tt2").toString)
    val a = new GraftTable(spark, cat, "a", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val b = new GraftTable(spark, cat, "b", StructType(Seq(
      StructField("id", LongType, nullable = false))))
    val before = cat.currentCommitId()
    Txn.run(cat, TxnOptions()) { tx =>
      tx.create(a, Seq(Tuple1(1L)).toDF("id"))
      tx.create(b, Seq(Tuple1(2L)).toDF("id"))
    }
    assert(cat.currentCommitId() == before + 1,
      "one transaction = one archived commit")
    assert(a.snapshotAt(before + 1).count() == 1)
    assert(b.snapshotAt(before + 1).count() == 1)
  }

  test("vacuum(keepHistory) reclaims old commit manifests, never the current") {
    val t = table()
    t.createMany(Seq((1L, "a")).toDF("id", "v"))
    t.updateMany(graft.query.RawCol(col("id") === 1L), Map("v" -> lit("b")))
    t.updateMany(graft.query.RawCol(col("id") === 1L), Map("v" -> lit("c")))
    val cur = t.catalog.currentCommitId()
    assert(cur == 3L)
    t.catalog.vacuum(retainMs = Long.MaxValue, keepHistory = 2)
    // oldest commit's manifest reclaimed → documented P2025
    val e = intercept[RecordNotFoundException](t.snapshotAt(1L))
    assert(e.code == "P2025")
    // newest two still travel exactly (slices retained by retainMs)
    assert(t.snapshotAt(2L).select($"v").as[String].head() == "b")
    assert(t.snapshotAt(cur).select($"v").as[String].head() == "c")
    // a cap below 1 still refuses to drop the current commit
    t.catalog.vacuum(retainMs = Long.MaxValue, keepHistory = 0)
    assert(t.snapshotAt(cur).select($"v").as[String].head() == "c")
    assert(t.catalog.currentCommitId() == cur)
  }
}
