package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Blocked fuzzy join: planted-typo recovery, block/band pruning
  * semantics, and the hash-equi-join (never nested-loop) plan shape. */
class LinkageSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("recovers planted single-character typos within the block") {
    val clean = Seq("red widget", "blue bolt", "small gizmo").toDF("name")
    val dirty = Seq("red widgt", "blue boltt", "small gizmo").toDF("name")
    val got = Linkage.fuzzyJoin(dirty, "name", clean, "name", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("red widgt", "red widget", 1L),
      ("blue boltt", "blue bolt", 1L)))
  }

  test("different first token blocks the pair even within distance") {
    val a = Seq("red bolt").toDF("name")
    val b = Seq("rad bolt").toDF("name") // dist 1, but block keys differ
    assert(Linkage.fuzzyJoin(a, "name", b, "name", maxDist = 2).count() == 0)
  }

  test("length band prunes before the verify; keepExact controls self-pairs") {
    val a = Seq("red w", "red widget").toDF("name")
    val b = Seq("red widget").toDF("name")
    // "red w" vs "red widget": same block, length differs by 5 > maxDist
    val noExact = Linkage.fuzzyJoin(a, "name", b, "name", maxDist = 2)
    assert(noExact.count() == 0)
    val withExact = Linkage.fuzzyJoin(a, "name", b, "name",
      maxDist = 2, keepExact = true)
    assert(withExact.as[(String, String, Long)].collect().toSet ==
      Set(("red widget", "red widget", 0L)))
  }

  test("pair generation is a hash equi-join on the block key") {
    val a = Seq("red widget").toDF("name")
    val b = Seq("red widgt").toDF("name")
    val p = Linkage.fuzzyJoin(a, "name", b, "name")
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }
}
