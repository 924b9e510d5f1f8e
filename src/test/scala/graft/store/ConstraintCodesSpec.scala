package graft.store

import graft.SparkTestBase
import graft.query.{CmpF, F}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** P2000 (value too long) and P2014 (required-relation violation) on the
  * write path — the two edge-case codes of the reference's generated
  * client (`src/db/client/effect.ts:17-196`) previously surfaced as
  * generic errors. */
class ConstraintCodesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(java.nio.file.Files.createTempDirectory("graft-codes").toString)

  private val companySchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false)))
  private val eventSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("companyId", LongType, nullable = false),
    StructField("note", StringType, nullable = true)))

  private def companyRows(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "name")
  private def eventRows(rows: (Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("id", "companyId", "note")

  test("__-prefixed column names are rejected at declaration (reserved for engine staging)") {
    // a user column named like an engine staging column (__pk, __o_<c>,
    // __present_o …) would collide deep inside a write or change-feed
    // plan; the declaration-time error is the legible one
    val e = intercept[IllegalArgumentException] {
      new GraftTable(spark, freshCatalog(), "t", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("__pk", StringType, nullable = true))))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("P2000: insert over a declared max length fails, at-cap passes") {
    val t = new GraftTable(spark, freshCatalog(), "company", companySchema,
      uniqueKeys = Seq(Seq("id")), maxLengths = Map("name" -> 10))
    t.createMany(companyRows((1L, "exactlyten")))
    val e = intercept[ValueTooLongException] {
      t.createMany(companyRows((2L, "elevenchars")))
    }
    assert(e.code == "P2000" && e.getMessage.contains("name"))
    assert(t.snapshot().count() == 1, "failed insert must stage nothing")
  }

  test("P2000: update over a declared max length fails and stages nothing") {
    val t = new GraftTable(spark, freshCatalog(), "company", companySchema,
      uniqueKeys = Seq(Seq("id")), maxLengths = Map("name" -> 10))
    t.createMany(companyRows((1L, "short")))
    val e = intercept[ValueTooLongException] {
      t.updateMany(F.cmp("id", CmpF(equals = Some(Some(1L)))),
        Map("name" -> lit("definitely-too-long")))
    }
    assert(e.code == "P2000")
    assert(t.snapshot().filter($"name" === "short").count() == 1)
  }

  test("P2000: upsert over a declared max length fails and stages nothing") {
    val t = new GraftTable(spark, freshCatalog(), "company", companySchema,
      uniqueKeys = Seq(Seq("id")), maxLengths = Map("name" -> 10))
    t.createMany(companyRows((1L, "short")))
    val e = intercept[ValueTooLongException] {
      t.upsert(Seq("id"), companyRows((1L, "definitely-too-long")))
    }
    assert(e.code == "P2000")
    assert(t.snapshot().filter($"name" === "short").count() == 1)
    // at-cap upsert passes (update arm) and a fresh key inserts
    t.upsert(Seq("id"), companyRows((1L, "exactlyten"), (2L, "ok")))
    assert(t.snapshot().count() == 2)
  }

  test("maxLengths config rejects unknown and non-string columns") {
    intercept[IllegalArgumentException] {
      new GraftTable(spark, freshCatalog(), "bad1", companySchema,
        maxLengths = Map("nope" -> 5))
    }
    intercept[IllegalArgumentException] {
      new GraftTable(spark, freshCatalog(), "bad2", companySchema,
        maxLengths = Map("id" -> 5))
    }
  }

  test("P2014: nulling a required FK severs the relation; plain non-nullable is P2011") {
    val cat = freshCatalog()
    val company = new GraftTable(spark, cat, "company", companySchema,
      uniqueKeys = Seq(Seq("id")))
    val event = new GraftTable(spark, cat, "crm_sync_event", eventSchema,
      uniqueKeys = Seq(Seq("id")))
    company.onDeleteRestrict(event, "companyId", "id")
    company.createMany(companyRows((1L, "acme")))
    event.createMany(eventRows((10L, 1L, "n1")))
    // required-relation column → P2014, not the raw-column P2011
    val e = intercept[RequiredRelationException] {
      event.updateMany(F.cmp("id", CmpF(equals = Some(Some(10L)))),
        Map("companyId" -> lit(null).cast(LongType)))
    }
    assert(e.code == "P2014")
    // a non-FK non-nullable column nulled the same way stays P2011
    val e2 = intercept[NullConstraintException] {
      event.updateMany(F.cmp("id", CmpF(equals = Some(Some(10L)))),
        Map("id" -> lit(null).cast(LongType)))
    }
    assert(e2.code == "P2011")
    // and the relation survives untouched
    assert(event.snapshot().filter($"companyId" === 1L).count() == 1)
  }
}
