package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-pass distributed ranking vs the single-reducer reference semantics. */
class RankingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("withGlobalPosition yields the gapless global order, multi-partition") {
    val df = spark.range(1000)
      .select((col("id") * 37 % 501).as("v"), col("id"))
    val pos = Ranking.withGlobalPosition(df, "p", Seq(col("v"), col("id")),
      numPartitions = 8)
    val rows = pos.orderBy("p").select("v", "id", "p").collect()
    assert(rows.map(_.getLong(2)).toSeq == (0L until 1000L))
    // positions agree with a driver-side sort of the same keys
    val expected = rows.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == expected.toSeq)
  }

  test("ntileExact matches single-reducer NTILE for uneven and tiny sizes") {
    for (n <- Seq(7L, 100L, 1003L); k <- Seq(3, 10)) {
      val df = spark.range(n).select((col("id") * 131 % 97).as("v"), col("id"))
      val w = Window.orderBy(col("v"), col("id"))
      val expected = df.withColumn("t", ntile(k).over(w).cast("long"))
        .select("id", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val actual = Ranking.ntileExact(df, k, "t", Seq(col("v"), col("id")),
        numPartitions = 8)
        .select("id", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(actual == expected, s"n=$n k=$k")
    }
  }

  test("ranking plan contains only partitioned windows (no single-reducer sort)") {
    val df = spark.range(5000).select((col("id") % 41).as("v"), col("id"))
    val out = Ranking.ntileExact(df, 10, "t", Seq(col("v"), col("id")))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the ranking path contains no window operator at all (per-partition
    // index + offset), so no single-reducer window can sneak in
    assert(!plan.contains("Window ["),
      "ranking should not plan a window operator:\n" + plan)
  }

  test("withGlobalPrefixSum matches the single-reducer running-sum window") {
    val df = spark.range(777)
      .select((col("id") * 53 % 211).as("v"), col("id"),
        (col("id") % 17).as("w"))
    val expected = df.withColumn("s",
        sum(col("w")).over(Window.orderBy(col("v"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val actual = Ranking.withGlobalPrefixSum(df, "s", col("w"),
        Seq(col("v"), col("id")), numPartitions = 8)
      .select("id", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(actual == expected)
    // null values count as zero
    val withNulls = df.withColumn("w",
      when(col("id") % 3 === 0, lit(null)).otherwise(col("w")))
    val total = Ranking.withGlobalPrefixSum(withNulls, "s", col("w"),
        Seq(col("v"), col("id"))).agg(max("s")).head().getLong(0)
    val direct = withNulls.agg(sum(coalesce(col("w"), lit(0L)))).head().getLong(0)
    assert(total == direct)
  }

  test("default partition count follows spark.sql.shuffle.partitions") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val df = spark.range(1000)
        .select((col("id") * 37 % 501).as("v"), col("id"))
      val out = Ranking.withGlobalPosition(df, "p", Seq(col("v"), col("id")))
      assert(out.rdd.getNumPartitions == 5,
        "two-pass ranking should size its range exchange from the session conf")
      // and the result is still the gapless global order
      assert(out.orderBy("p").select("p").collect().map(_.getLong(0)).toSeq
        == (0L until 1000L))
      // explicit caller count still wins over the conf
      val explicit = Ranking.withGlobalPosition(df, "p",
        Seq(col("v"), col("id")), numPartitions = 8)
      assert(explicit.rdd.getNumPartitions == 8)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("token-budget shards are contiguous, budget-bounded, and split no doc") {
    val df = spark.range(300).select(col("id"),
      ((col("id") * 7919 % 97) + 1).as("tok"))
    val out = Packing.assignShardsByTokenBudget(df, Seq(col("id")),
      col("tok"), budget = 500L).orderBy("id").collect()
    val shards = out.map(_.getLong(2))
    // contiguous non-decreasing assignment over the global order
    assert(shards.sameElements(shards.sorted))
    // each shard's token total stays under budget + one doc spill
    val byShard = out.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(1)).sum)
    byShard.toSeq.sortBy(_._1).init.foreach { case (sh, tot) =>
      assert(tot <= 500L + 97L, s"shard $sh overfilled: $tot") }
    // every shard except possibly the last is at least budget-minus-one-doc full
    byShard.toSeq.sortBy(_._1).init.foreach { case (sh, tot) =>
      assert(tot >= 500L - 97L, s"shard $sh underfilled: $tot") }
  }
}
