package graft.store

import graft.SparkTestBase
import graft.query.{AggSpec, CmpF, F, QueryArgs}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Store-backed Model with data skipping: the Prisma read surface routes
  * where-clause scalars through snapshotWhere, results identical to the
  * unpruned model on every entry point. */
class ModelSkipSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def seeded(): GraftTable = {
    val t = new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-ms").toString),
      "events", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("bucket", StringType, nullable = false),
        StructField("score", DoubleType, nullable = true))),
      uniqueKeys = Seq(Seq("id")), partitionCols = Seq("bucket"))
    val rows = (0 until 4).flatMap { b =>
      (0 until 25).map(i => (b * 100L + i, s"b$b", b * 1.0 + i / 100.0))
    }
    t.createMany(rows.toDF("id", "bucket", "score"))
    t
  }

  test("findMany/count/aggregate agree with the unpruned model") {
    val t = seeded()
    val pruned = t.model("id")
    val plain = new graft.query.Model(() => t.snapshot(), "id")
    val where = Some(F.cmp("id", CmpF(gte = Some(100L), lt = Some(150L))))

    val a = pruned.findMany(QueryArgs(where = where))
      .select("id").as[Long].collect().sorted
    val b = plain.findMany(QueryArgs(where = where))
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b) && a.length == 25)

    assert(pruned.count(where) == 25L)
    val agg = pruned.aggregate(AggSpec(min = Seq("id"), max = Seq("id")), where)
      .head()
    assert(agg.getLong(0) == 100L && agg.getLong(1) == 124L)
  }

  test("the pruned source actually skips slices for the same predicate") {
    val t = seeded()
    // the where fragment the model hands snapshotWhere prunes 3 of 4 slices
    assert(t.prunedDirs(col("id") >= 100L && col("id") < 150L)._1.size == 1)
  }

  test("where clauses the pruner can't use still answer correctly") {
    val t = seeded()
    val m = t.model("id")
    // OR at the top level reaches the pruner as one opaque conjunct —
    // mayMatch answers true for it, so nothing is skipped and the full
    // where tree still decides membership
    val where = Some(F.eq("id", 5L).or(F.eq("id", 305L)))
    assert(m.count(where) == 2L)
    // no where at all
    assert(m.count(None) == 100L)
  }
}
