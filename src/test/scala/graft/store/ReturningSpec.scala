package graft.store

import graft.SparkTestBase
import graft.functions.Ids
import graft.query.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** createManyAndReturn / updateManyAndReturn (SURVEY §2.A #8, #12) + cuid. */
class ReturningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("status", BooleanType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)))

  private def table(): GraftTable = new GraftTable(spark,
    new Catalog(java.nio.file.Files.createTempDirectory("graft-ret").toString),
    "t", schema, uniqueKeys = Seq(Seq("id"), Seq("name")),
    timestampCols = Seq("updatedAt"))

  private def rows(xs: (String, String)*): DataFrame =
    xs.toSeq.toDF("id", "name")
      .withColumn("status", lit(null).cast(BooleanType))
      .withColumn("updatedAt", lit(null).cast(TimestampType))

  test("createManyAndReturn returns exactly the inserted rows") {
    val t = table()
    t.createMany(rows(("a", "A")))
    val ret = t.createManyAndReturn(rows(("a", "DUP-A-ID"), ("b", "B"), ("c", "C")),
      skipDuplicates = true)
    assert(ret.select("id").as[String].collect().toSet == Set("b", "c"))
    assert(t.snapshot().count() == 3)
  }

  test("createManyAndReturn without skipDuplicates throws and publishes nothing") {
    val t = table()
    t.createMany(rows(("a", "A")))
    intercept[UniqueViolationException] {
      t.createManyAndReturn(rows(("a", "X")), skipDuplicates = false)
    }
    assert(t.snapshot().count() == 1)
  }

  test("updateManyAndReturn returns the post-update matched slice") {
    val t = table()
    t.createMany(rows(("a", "A"), ("b", "B"), ("c", "C")))
    val ret = t.updateManyAndReturn(
      F.str("name", graft.query.StringF(in = Some(Seq("A", "B")))),
      Map("status" -> lit(true)))
    assert(ret.count() == 2)
    assert(ret.filter($"status" <=> true).count() == 2)
    assert(ret.select("id").as[String].collect().toSet == Set("a", "b"))
    // committed state matches what was returned
    assert(t.snapshot().filter($"status" <=> true).count() == 2)
  }

  test("cuid generates unique, well-formed ids; deterministicId is stable") {
    val ids = spark.range(5000).select(Ids.cuid().as("id"))
    assert(ids.distinct().count() == 5000)
    assert(ids.filter(!$"id".rlike("^c[0-9a-f]+$")).count() == 0)
    val d1 = spark.range(10).select(Ids.deterministicId("x", $"id".cast("string")).as("k"))
    val d2 = spark.range(10).select(Ids.deterministicId("x", $"id".cast("string")).as("k"))
    assert(d1.exceptAll(d2).count() == 0)
  }

  test("Retry.onConflict retries OCC conflicts until success") {
    var attempts = 0
    val out = graft.pipeline.Retry.onConflict(times = 5, baseMs = 1) {
      attempts += 1
      if (attempts < 3) throw new ConcurrentModificationException("simulated")
      "ok"
    }
    assert(out == "ok" && attempts == 3)
    intercept[ConcurrentModificationException] {
      graft.pipeline.Retry.onConflict(times = 2, baseMs = 1) {
        throw new ConcurrentModificationException("always")
      }
    }
  }

  test("pipeline stages emit notifications with valid enum + parseable JSON metadata") {
    import graft.pipeline._
    val st = new PipelineStore(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-notif").toString))
    val urls = Seq(("g1", "https://maps.example/x", Some("L")))
      .toDF("id", "url", "location")
      .withColumn("status", lit(null).cast(BooleanType))
      .withColumn("notes", lit(null).cast(StringType))
      .withColumn("createdAt", lit(null).cast(TimestampType))
      .withColumn("updatedAt", lit(null).cast(TimestampType))
    st.urls.createMany(urls)
    Stages.runLocator(st, new SyntheticPlacesExtractor(2))
    val notifs = st.notifications.snapshot()
    assert(notifs.count() == 1)
    val n = notifs.head()
    assert(n.getAs[String]("serviceName") == "Places_Locator")
    val parsed = notifs.select(get_json_object($"metadata", "$.processed").cast("long").as("p"))
      .as[Long].head()
    assert(parsed == 1L)
  }
}
