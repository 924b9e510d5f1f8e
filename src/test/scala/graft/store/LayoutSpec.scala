package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite with SparkTestBase {

  test("same-bucketed tables join without a shuffle on either side") {
    // clear any stale catalog entries AND leftover managed-table locations
    // (a prior JVM's in-memory catalog dies but its warehouse dirs don't)
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    val o = graft.Tables.orders(spark, sfDir)
    val l = graft.Tables.lineitem(spark, sfDir)
    Layout.writeBucketed(o.withColumnRenamed("o_orderkey", "okey"), "orders_b", "okey", 4)
    Layout.writeBucketed(l.withColumnRenamed("l_orderkey", "okey"), "lineitem_b", "okey", 4)

    // force the non-broadcast path: the point is bucket co-location, and
    // at real scale neither side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = Layout.bucketedJoin(spark, "orders_b", "lineitem_b", "okey")
      joined.collect()
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

    // result parity with the plain join
    val plain = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
    assert(Layout.bucketedJoin(spark, "orders_b", "lineitem_b", "okey").count() == plain)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
