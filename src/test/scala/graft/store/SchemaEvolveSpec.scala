package graft.store

import graft.SparkTestBase
import graft.query.RawCol
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only schema evolution: add/drop without file rewrites,
  * null-fill on old files, old handles unaffected, guarded drops. */
class SchemaEvolveSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  private def fresh(): (Catalog, GraftTable) = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-evolve").toString)
    (cat, new GraftTable(spark, cat, "t", schema, uniqueKeys = Seq(Seq("id"))))
  }

  test("added column null-fills old files and carries new writes") {
    val (cat, t) = fresh()
    t.createMany(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val fileCount0 = cat.currentDirs("t").values
      .flatMap(d => new java.io.File(d).listFiles().toSeq).size

    val t2 = t.evolve(add = Seq(StructField("tier", StringType, nullable = true)))
    // evolution itself rewrote nothing
    val fileCount1 = cat.currentDirs("t").values
      .flatMap(d => new java.io.File(d).listFiles().toSeq).size
    assert(fileCount0 == fileCount1)

    t2.createMany(Seq((3L, "c", "gold")).toDF("id", "name", "tier"))
    val got = t2.snapshot().select($"id", $"tier")
      .as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, None), (2L, None), (3L, Some("gold"))))

    // updates through the evolved handle can set the new column
    t2.updateMany(RawCol(col("id") === 1L), Map("tier" -> lit("silver")))
    assert(t2.snapshot().filter($"id" === 1L).select($"tier")
      .as[String].head() == "silver")
  }

  test("old handle keeps reading after evolution (projection of the files)") {
    val (_, t) = fresh()
    t.createMany(Seq((1L, "a")).toDF("id", "name"))
    val t2 = t.evolve(add = Seq(StructField("tier", StringType, nullable = true)))
    t2.createMany(Seq((2L, "b", "gold")).toDF("id", "name", "tier"))
    assert(t.snapshot().columns.toSeq == Seq("id", "name"))
    assert(t.snapshot().count() == 2)
  }

  test("dropped column disappears from reads without touching files") {
    val (_, t) = fresh()
    t.createMany(Seq((1L, "a")).toDF("id", "name"))
    val t2 = t.evolve(drop = Seq("name"))
    assert(t2.snapshot().columns.toSeq == Seq("id"))
    assert(t2.snapshot().count() == 1)
  }

  test("stale PRE-evolve writer fails with P2022 instead of nulling evolved columns") {
    val (_, t) = fresh()
    t.createMany(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val t2 = t.evolve(add = Seq(StructField("tier", StringType, nullable = true)))
    t2.updateMany(RawCol(col("id") === 1L), Map("tier" -> lit("gold")))

    // the stale handle's rewrite would project `tier` away for EVERY row
    // in the touched slice — the guard turns that silent loss into P2022
    val e = intercept[StaleSchemaException] {
      t.updateMany(RawCol(col("id") === 2L), Map("name" -> lit("B")))
    }
    assert(e.getMessage.contains("P2022"))
    intercept[StaleSchemaException] {
      t.createMany(Seq((9L, "z")).toDF("id", "name"))
    }
    // evolved-column data survived untouched; the evolved handle still writes
    assert(t2.snapshot().filter($"id" === 1L).select($"tier").as[String].head() == "gold")
    t2.updateMany(RawCol(col("id") === 2L), Map("name" -> lit("B")))
    assert(t2.snapshot().filter($"id" === 2L).select($"name").as[String].head() == "B")
    // stale READERS stay valid (projection of the files)
    assert(t.snapshot().count() == 2)
  }

  test("compact() from a stale handle fails P2022 instead of nulling evolved columns") {
    val (_, t) = fresh()
    t.createMany(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    val t2 = t.evolve(add = Seq(StructField("tier", StringType, nullable = true)))
    t2.updateMany(RawCol(col("id") === 1L), Map("tier" -> lit("gold")))
    // compact rewrites whole slices through the handle's projection,
    // outside any Txn — the stale handle must be refused
    intercept[StaleSchemaException] { t.compact(maxFiles = 0) }
    assert(t2.snapshot().filter($"id" === 1L).select($"tier").as[String].head() == "gold")
    // the evolved handle compacts fine and the data survives
    t2.compact(maxFiles = 0)
    assert(t2.snapshot().filter($"id" === 1L).select($"tier").as[String].head() == "gold")
  }

  test("evolve() from a stale handle fails P2022 instead of superseding the newer schema") {
    val (_, t) = fresh()
    t.createMany(Seq((1L, "a")).toDF("id", "name"))
    val t2 = t.evolve(add = Seq(StructField("tier", StringType, nullable = true)))
    // the stale pre-evolve handle must not commit a fingerprint derived
    // from its stale lineage (it would orphan `tier` and legitimize
    // writers that null it)
    intercept[StaleSchemaException] {
      t.evolve(add = Seq(StructField("score", LongType, nullable = true)))
    }
    // the current handle evolves fine
    val t3 = t2.evolve(add = Seq(StructField("score", LongType, nullable = true)))
    t3.updateMany(RawCol(col("id") === 1L), Map("score" -> lit(5L)))
    assert(t3.snapshot().filter($"id" === 1L).select($"score").as[Long].head() == 5L)
  }

  test("second evolve supersedes the first fingerprint; mid handles go stale") {
    val (_, t) = fresh()
    t.createMany(Seq((1L, "a")).toDF("id", "name"))
    val t2 = t.evolve(add = Seq(StructField("tier", StringType, nullable = true)))
    val t3 = t2.evolve(add = Seq(StructField("score", LongType, nullable = true)))
    intercept[StaleSchemaException] {
      t2.updateMany(RawCol(col("id") === 1L), Map("tier" -> lit("x")))
    }
    t3.updateMany(RawCol(col("id") === 1L), Map("score" -> lit(7L)))
    assert(t3.snapshot().filter($"id" === 1L).select($"score").as[Long].head() == 7L)
  }

  test("guards: non-nullable add, duplicate add, protected drop") {
    val (_, t) = fresh()
    intercept[IllegalArgumentException] {
      t.evolve(add = Seq(StructField("x", LongType, nullable = false)))
    }
    intercept[IllegalArgumentException] {
      t.evolve(add = Seq(StructField("name", StringType, nullable = true)))
    }
    intercept[IllegalArgumentException] { t.evolve(drop = Seq("id")) }
  }

  test("FK-backing columns refuse to drop on both sides") {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-evolve-fk").toString)
    val parent = new GraftTable(spark, cat, "p", schema,
      uniqueKeys = Seq(Seq("id")))
    val child = new GraftTable(spark, cat, "c", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("pid", LongType, nullable = true),
      StructField("note", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("id")))
    parent.onDeleteRestrict(child, "pid", "name") // name backs the FK
    intercept[IllegalArgumentException] { parent.evolve(drop = Seq("name")) }
    intercept[IllegalArgumentException] { child.evolve(drop = Seq("pid")) }
    // unrelated columns still drop fine
    assert(child.evolve(drop = Seq("note")).schema.fieldNames.toSeq ==
      Seq("id", "pid"))
  }
}
