package graft.store

import graft.SparkTestBase
import graft.query.RawCol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Join-view maintenance: the delta-folded A ⋈ B state stays equal to a
  * from-scratch re-join through inserts, deletes, value updates, and
  * join-key-moving updates on BOTH sides — including the cancellation
  * cases (moved row whose old partner was deleted in the same range). */
class MaterializedJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val ordSchema = StructType(Seq(
    StructField("okey", LongType, nullable = false),
    StructField("ckey", LongType, nullable = false),
    StructField("total", DoubleType, nullable = true)))
  private val custSchema = StructType(Seq(
    StructField("ckey", LongType, nullable = false),
    StructField("seg", StringType, nullable = true)))

  private def fresh(): (Catalog, GraftTable, GraftTable) = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-ivmj").toString)
    (cat,
      new GraftTable(spark, cat, "ord", ordSchema, uniqueKeys = Seq(Seq("okey"))),
      new GraftTable(spark, cat, "cust", custSchema, uniqueKeys = Seq(Seq("ckey"))))
  }

  private def normalized(df: DataFrame): Set[(Long, Long, Option[Double], Option[String], Long)] =
    df.select($"okey", $"ckey", $"total", $"seg", $"__m")
      .as[(Long, Long, Option[Double], Option[String], Long)].collect().toSet

  private def fold(state: DataFrame, cat: Catalog, ords: GraftTable,
                   custs: GraftTable, pin: Long): DataFrame = {
    val now = cat.currentCommitId()
    MaterializedJoin.applyDelta(state,
      ChangeFeed.changesBetween(ords, pin, now), ords.snapshotAt(pin),
      ChangeFeed.changesBetween(custs, pin, now), custs.snapshot(), Seq("ckey"))
  }

  test("delta-folded join state equals re-join through a two-sided mutation storm") {
    val (cat, ords, custs) = fresh()
    ords.createMany((1L to 40L).map(i => (i, (i % 10) + 1, i * 1.5))
      .toDF("okey", "ckey", "total"))
    custs.createMany((1L to 10L).map(c => (c, s"seg$c")).toDF("ckey", "seg"))
    var state = MaterializedJoin.compute(
      ords.snapshot(), custs.snapshot(), Seq("ckey"))
    var pin = cat.currentCommitId()

    // every hard case in one range: key-moving update on A whose old
    // partner is ALSO deleted from B, value update on B, deletes and
    // inserts on both sides
    ords.updateMany(RawCol(col("ckey") === 9L), Map("ckey" -> lit(1L)))
    custs.deleteMany(RawCol(col("ckey") === 9L))
    custs.updateMany(RawCol(col("ckey") <= 3L), Map("seg" -> lit("moved")))
    ords.deleteMany(RawCol(col("okey") > 35L))
    ords.createMany(Seq((90L, 2L, 9.75), (91L, 99L, 1.0)) // 99 dangles: no join row
      .toDF("okey", "ckey", "total"))
    custs.createMany(Seq((11L, "fresh")).toDF("ckey", "seg"))

    state = fold(state, cat, ords, custs, pin)
    val recomputed = MaterializedJoin.compute(
      ords.snapshot(), custs.snapshot(), Seq("ckey"))
    assert(normalized(state) == normalized(recomputed))
    assert(state.filter($"__m" =!= 1L).count() == 0) // unique PKs ⇒ all 1

    // second fold from the new pin: the state is a real running view
    pin = cat.currentCommitId()
    custs.updateMany(RawCol(col("ckey") === 1L), Map("seg" -> lit(null: String)))
    ords.updateMany(RawCol(col("okey") === 90L), Map("total" -> lit(null: String).cast("double")))
    state = fold(state, cat, ords, custs, pin)
    assert(normalized(state) == normalized(MaterializedJoin.compute(
      ords.snapshot(), custs.snapshot(), Seq("ckey"))))
  }

  test("NULL-valued images pair null-safely with their state rows") {
    val (cat, ords, custs) = fresh()
    ords.createMany(Seq((1L, 5L, null.asInstanceOf[java.lang.Double]),
      (2L, 5L, java.lang.Double.valueOf(2.0)))
      .toDF("okey", "ckey", "total"))
    custs.createMany(Seq((5L, null.asInstanceOf[String])).toDF("ckey", "seg"))
    var state = MaterializedJoin.compute(
      ords.snapshot(), custs.snapshot(), Seq("ckey"))
    val pin = cat.currentCommitId()
    // delete the NULL-total row: its −1 delta must find the NULL-imaged
    // state row (a null-unsafe merge would strand both, leaving a ghost)
    ords.deleteMany(RawCol(col("okey") === 1L))
    state = fold(state, cat, ords, custs, pin)
    assert(normalized(state) == normalized(MaterializedJoin.compute(
      ords.snapshot(), custs.snapshot(), Seq("ckey"))))
    assert(state.count() == 1)
  }
}
