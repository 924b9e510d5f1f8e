package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE TO COMMIT: a pure manifest rollback — no data rewrite, history
  * stays append-only, OCC applies, vacuumed targets are refused. */
class RestoreSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshTable(n: String): GraftTable =
    new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory(s"graft-$n").toString),
      "t", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", LongType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))

  private def rows(t: GraftTable): Seq[(Long, Long)] =
    t.snapshot().orderBy("id").as[(Long, Long)].collect().toSeq

  test("restore rolls pointers back and the bad commits stay travelable") {
    val t = freshTable("restore")
    t.createMany((1L to 50L).map(i => (i, i)).toDF("id", "v"))
    val good = t.catalog.currentCommitId()
    val before = rows(t)
    t.updateMany(graft.query.RawCol(col("id") <= 10L), Map("v" -> lit(0L)))
    t.deleteMany(graft.query.RawCol(col("id") > 40L))
    val bad = t.catalog.currentCommitId()
    assert(rows(t) != before)

    t.restoreTo(good)
    assert(rows(t) == before, "restored snapshot must equal the good commit")
    // restore is itself a commit, never a history rewrite
    assert(t.catalog.currentCommitId() == bad + 1)
    // time travel ACROSS the restore still sees the mutated state
    val atBad = t.snapshotAt(bad).orderBy("id").as[(Long, Long)].collect()
    assert(atBad.length == 40 && atBad.take(10).forall(_._2 == 0L))
    // and the restore commit itself is travelable
    assert(t.snapshotAt(bad + 1).count() == 50L)
  }

  test("restore to commit 0 empties the table; no-op restore publishes nothing") {
    val t = freshTable("restore0")
    t.createMany(Seq((1L, 1L), (2L, 2L)).toDF("id", "v"))
    val c1 = t.catalog.currentCommitId()
    t.restoreTo(0L)
    assert(t.snapshot().count() == 0L)
    assert(t.catalog.currentCommitId() == c1 + 1)
    // pointers already equal → nothing published
    t.restoreTo(0L)
    assert(t.catalog.currentCommitId() == c1 + 1)
    // forward again: the data commit is still there
    t.restoreTo(c1)
    assert(rows(t) == Seq((1L, 1L), (2L, 2L)))
  }

  test("restore refuses a vacuumed target instead of dangling pointers") {
    val t = freshTable("restorevac")
    t.createMany(Seq((1L, 1L)).toDF("id", "v"))
    val old = t.catalog.currentCommitId()
    t.updateMany(graft.query.RawCol(lit(true)), Map("v" -> lit(9L)))
    t.catalog.vacuum(retainMs = 0) // reclaims the superseded version
    val e = intercept[RecordNotFoundException] { t.restoreTo(old) }
    assert(e.code == "P2025")
    assert(rows(t) == Seq((1L, 9L)), "failed restore must not move pointers")
  }

  test("a racing writer turns restore into the usual P2034 conflict") {
    val t = freshTable("restoreocc")
    t.createMany(Seq((1L, 1L)).toDF("id", "v"))
    val good = t.catalog.currentCommitId()
    t.updateMany(graft.query.RawCol(lit(true)), Map("v" -> lit(2L)))
    // interleave: another writer lands between manifest read and commit —
    // simulated by restoring from a handle whose base is already stale
    val stale = t.catalog.manifest()
    t.updateMany(graft.query.RawCol(lit(true)), Map("v" -> lit(3L)))
    // restoreTo re-reads the manifest itself, so drive the conflict at
    // the commit layer with the stale base restore would have used
    intercept[ConcurrentModificationException] {
      t.catalog.commit(
        Map("t" -> stale.get("t")),
        Map("t" -> t.catalog.manifestAt(good)("t").map {
          case (pk, v) => pk -> Some(v) }))
    }
    // the real restore still succeeds afterwards (retry semantics)
    t.restoreTo(good)
    assert(rows(t) == Seq((1L, 1L)))
  }

  test("restore across schema evolution keeps the current read schema") {
    val t = freshTable("restoreevolve")
    t.createMany(Seq((1L, 1L)).toDF("id", "v"))
    val preEvolve = t.catalog.currentCommitId()
    val t2 = t.evolve(add = Seq(StructField("w", LongType, nullable = true)))
    t2.createMany(Seq((2L, 2L, 20L)).toDF("id", "v", "w"))
    t2.restoreTo(preEvolve)
    // old files lack w → read as NULL under the evolved schema
    val got = t2.snapshot().orderBy("id")
      .select($"id", $"v", $"w").collect().map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, -1L)))
    // the STALE pre-evolve handle may not restore (P2022 guard)
    intercept[StaleSchemaException] { t.restoreTo(preEvolve) }
  }
}
