package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order compaction + file-granularity data skipping: interleaving
  * correctness, per-file range tightening, and skip ratios on both
  * clustered dimensions. */
class ZorderSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits of quantized coordinates") {
    // 2 columns, 2 bits each, ranges [0,3]: z(x,y) = morton2(qx, qy)
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L))
      .toDF("x", "y")
    val got = df.select(Zorder.zValue(Seq($"x", $"y"),
        Seq(0.0, 0.0), Seq(3.0, 3.0), bitsPer = 2).as("z"))
      .as[Long].collect().toSeq
    // morton: bit j of x -> bit 2j, bit j of y -> bit 2j+1
    def morton(x: Long, y: Long): Long =
      (0 until 2).map(j => (((x >> j) & 1L) << (2 * j)) |
                           (((y >> j) & 1L) << (2 * j + 1))).sum
    assert(got == Seq(morton(0, 0), morton(3, 0), morton(0, 3),
      morton(3, 3), morton(1, 2)))
  }

  test("zValue handles nulls and degenerate ranges") {
    val df = Seq((Some(5L), 1L), (None, 1L)).toDF("x", "y")
    val got = df.select(Zorder.zValue(Seq($"x", $"y"),
        Seq(0.0, 1.0), Seq(10.0, 1.0), bitsPer = 4).as("z"))
      .as[Long].collect().toSeq
    assert(got(1) == 0L, "null clusters at the low end")
    assert(got(0) > 0L)
    // y's degenerate [1,1] range contributes nothing for either row
  }

  private def grid(): GraftTable = {
    import org.apache.spark.sql.types._
    val t = new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-z").toString),
      "grid", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("x", LongType, nullable = false),
        StructField("y", LongType, nullable = false))))
    // row order follows id => natural layout clusters y (id div 100) and
    // scatters x (id mod 100) across every file
    val rows = (0L until 10000L).map(i => (i, i % 100L, i / 100L))
    t.createMany(rows.toDF("id", "x", "y").repartitionByRange(8, $"id"))
    t
  }

  test("z-order compaction tightens per-file ranges on BOTH dimensions") {
    val t = grid()
    val predX = col("x") >= 10L && col("x") < 20L   // 10% of x space
    val predY = col("y") >= 10L && col("y") < 20L
    val (_, keptXBefore, totalBefore) = t.prunedPaths(predX)
    assert(totalBefore > 0)
    // natural layout: x scattered everywhere -> no x-file can be skipped
    assert(keptXBefore == totalBefore, "x unclustered before z-order")

    val n = t.compact(targetBytes = 16L << 10, zorderBy = Seq("x", "y"))
    assert(n == 1)
    val (_, keptX, totalX) = t.prunedPaths(predX)
    val (_, keptY, totalY) = t.prunedPaths(predY)
    assert(totalX >= 4, s"want a multi-file slice, got $totalX")
    assert(keptX < totalX, s"x files: kept $keptX of $totalX")
    assert(keptY < totalY, s"y files: kept $keptY of $totalY")

    // results stay exact under file skipping
    val got = t.snapshotWhere(predX && predY).select("id")
      .as[Long].collect().sorted
    val want = t.snapshot().filter(predX && predY).select("id")
      .as[Long].collect().sorted
    assert(got.sameElements(want) && got.length == 100) // 10×10 of the grid
  }

  test("file skipping never loses rows on boundary predicates") {
    val t = grid()
    t.compact(targetBytes = 16L << 10, zorderBy = Seq("x", "y"))
    for (pred <- Seq(col("x") === 0L, col("x") === 99L,
        col("y") === 0L && col("x") <= 1L, col("id") === 9999L)) {
      val got = t.snapshotWhere(pred).count()
      val want = t.snapshot().filter(pred).count()
      assert(got == want, s"pred $pred: $got != $want")
    }
  }
}
