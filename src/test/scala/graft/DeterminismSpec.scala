package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t2 gate hash-compares results — any nondeterminism (partition
  * ordering, rand(), time-dependent expressions) silently breaks it. Every
  * driver query must produce IDENTICAL ordered output across two separate
  * evaluations. */
class DeterminismSpec extends AnyFunSuite with SparkTestBase {

  test("every SparkEntry query is run-to-run deterministic") {
    val flaky = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val a = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
      val b = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
      if (a == b) None else Some(name)
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }
}
