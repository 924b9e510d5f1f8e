package graft.pipeline

import graft.SparkTestBase
import graft.functions.GraftFunctions
import graft.store.Catalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypedSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import TypedEntities._

  test("typed Dataset views: tri-state status as Option[Boolean]") {
    implicit val s = spark
    val st = new PipelineStore(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-typed").toString))
    val urls = Seq(
      ("g1", "https://a.example", Some("L"), Some(true)),
      ("g2", "https://b.example", None, Option.empty[Boolean]))
      .toDF("id", "url", "location", "status")
      .withColumn("notes", lit(null).cast(StringType))
      .withColumn("createdAt", lit(null).cast(TimestampType))
      .withColumn("updatedAt", lit(null).cast(TimestampType))
    st.urls.createMany(urls)
    val ds = st.urlsDs
    val byId = ds.collect().map(u => u.id -> u).toMap
    assert(byId("g1").status.contains(true) && byId("g1").location.contains("L"))
    assert(byId("g2").status.isEmpty && byId("g2").location.isEmpty)
    // typed transformations compile against fields
    val pending = ds.filter((u: GooglePlaceUrl) => u.status.isEmpty).count()
    assert(pending == 1)
  }

  test("custom expressions registered as SQL functions work in spark.sql") {
    GraftFunctions.register(spark)
    graft.Tables.documents(spark, sfDir).createOrReplaceTempView("docs_typed")
    val out = spark.sql("""
      SELECT doc_id,
             simhash64(transform(split(lower(text), '[^a-z0-9]+'), t -> xxhash64(t))) AS sh,
             dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
      FROM docs_typed LIMIT 5""").collect()
    assert(out.length == 5)
    assert(out.forall(_.getAs[Double]("dp") == 11.0))
    // SQL simhash agrees with the Column-API simhash on the same input
    val viaCol = graft.Tables.documents(spark, sfDir).limit(5)
      .select($"doc_id", graft.functions.SketchExpressions.simhash64(
        transform(split(lower($"text"), "[^a-z0-9]+"), t => xxhash64(t))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => viaCol(r.getLong(0)) == r.getAs[Long]("sh")))
  }
}
