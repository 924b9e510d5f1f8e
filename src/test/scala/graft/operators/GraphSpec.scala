package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Independent single-threaded reference of the fixed-point recurrence. */
  private def reference(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                        iters: Int): Map[Long, Long] = {
    val outw = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2)
      r = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty)
          .map { case (u, _, w) => (r(u) * w * 850L) / (outw(u) * 1000L) }
          .sum
        v -> (150000L + s)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                  iters: Int, parts: Int): Map[Long, Long] =
    Graph.pageRankFixedPoint(
        edges.toDF("src", "dst", "w").repartition(parts),
        nodes.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a symmetric 2-cycle is a fixed point at the initial mass") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L))
    val out = run(edges, Seq(1L, 2L), iters = 5, parts = 2)
    // 150000 + (1000000*850)//1000 = 1000000 exactly, every round
    assert(out == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("matches the single-threaded reference on a weighted digraph with danglers") {
    val edges = Seq(
      (1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L),
      (3L, 1L, 1L), (4L, 1L, 5L)) // 5 is isolated, 4 has no in-edges
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val expect = reference(edges, nodes, 5)
    assert(run(edges, nodes, 5, parts = 3) == expect)
    assert(expect(5L) == 150000L) // isolated: teleport mass only
  }

  private def triangles(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    Graph.triangleCounts(
        edges.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "w"),
        nodes.toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangleCounts: 4-clique gives every node C(3,2)=3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(triangles(k4, 1L to 4L) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: paths and isolated nodes report 0") {
    assert(triangles(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 1L to 5L) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("triangleCounts: direction, duplicates, and self-loops are canonicalized away") {
    // the same triangle expressed with reversed/duplicated edges + a self-loop
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 3L))
    assert(triangles(messy, 1L to 3L) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bit-identical across partitionings (integer fixed point commutes)") {
    val rng = new scala.util.Random(7)
    val edges = (0 until 200).map(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(20).toLong, 1L + rng.nextInt(9)))
      .distinct.map { case (a, b, w) => (a, b, w.toLong) }
    val nodes = (0L until 20L).toSeq
    assert(run(edges, nodes, 5, parts = 1) == run(edges, nodes, 5, parts = 13))
  }

  private def communities(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                          iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst", "w"),
        nodes.toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two heavy cliques joined by a light bridge split") {
    // clique {1,2,3} and {10,11,12} with weight-5 edges; bridge 3-10 weight 1
    val heavy = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L)).map { case (a, b) => (a, b, 5L) }
    val got = communities(heavy :+ ((3L, 10L, 1L)),
      Seq(1L, 2L, 3L, 10L, 11L, 12L), iters = 4)
    assert(got.filterKeys(_ <= 3L).values.toSet.size == 1)
    assert(got.filterKeys(_ >= 10L).values.toSet.size == 1)
    assert(got(1L) != got(10L), got.toString)
  }

  test("labelPropagation: isolated nodes keep their own label") {
    val got = communities(Seq((1L, 2L, 3L)), Seq(1L, 2L, 9L), iters = 3)
    assert(got(9L) == 9L)
  }

  test("labelPropagation: deterministic across partitionings") {
    val rng = new scala.util.Random(11)
    val edges = (0 until 150).map(_ =>
      (rng.nextInt(15).toLong, rng.nextInt(15).toLong,
        (1L + rng.nextInt(9)).toLong)).distinct
    val nodes = (0L until 15L).toSeq
    val a = Graph.labelPropagation(
      edges.toDF("src", "dst", "w").repartition(1), nodes.toDF("id"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.labelPropagation(
      edges.toDF("src", "dst", "w").repartition(13), nodes.toDF("id"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
