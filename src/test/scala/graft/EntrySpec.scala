package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite with SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and has a schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.collect() // must execute without throwing
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("q_find_unique returns exactly the keyed row") {
    val rows = SparkEntry.queries("q_find_unique")(spark, sfDir).collect()
    assert(rows.length == 1 && rows(0).getAs[Long]("c_custkey") == 42L)
  }
}
