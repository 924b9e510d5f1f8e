package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25: substring tf semantics, hand-computed scores on a tiny corpus,
  * zero-hit pruning, and the no-shuffle stats+broadcast plan shape. */
class RelevanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("termCount is exact non-overlapping substring count") {
    val df = Seq("abcabc", "aaa", "", "xyz").toDF("t")
    val got = df.select(Relevance.termCount($"t", "abc").as("c1"),
        Relevance.termCount($"t", "aa").as("c2"))
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((2, 0), (0, 1), (0, 0), (0, 0)))
  }

  test("scores match the Okapi formula computed by hand") {
    // corpus of 4 docs, term "x": df=2, N=4, lengths 10,20,30,40 (avg 25)
    val docs = Seq(
      (1L, "x y x", 10L), (2L, "x z", 20L),
      (3L, "y z", 30L), (4L, "q", 40L)).toDF("id", "text", "len")
    val got = Relevance.bm25(docs, "id", "text", "len", Seq("x"))
      .select($"id", $"n_terms", $"bm25")
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq

    // mirror the operator's IEEE op order exactly (incl. 1.2 + 1.0, not 2.2)
    def score(tf: Double, dl: Double): Double = {
      val idf = math.log(1.0 + ((4.0 - 2.0) + 0.5) / (2.0 + 0.5))
      val norm = tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / 25.0))
      BigDecimal(idf * norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.map(_._1) == Seq(1L, 2L), "zero-hit docs must be pruned")
    assert(got.map(_._2) == Seq(1, 1))
    assert(got(0)._3 == score(2.0, 10.0))
    assert(got(1)._3 == score(1.0, 20.0))
  }

  test("multi-term scores add and n_terms counts matched terms") {
    val docs = Seq((1L, "x y", 4L), (2L, "x", 4L)).toDF("id", "text", "len")
    val one = Relevance.bm25(docs, "id", "text", "len", Seq("x"))
      .select($"bm25").as[Double].collect().toSet
    val both = Relevance.bm25(docs, "id", "text", "len", Seq("x", "y"))
      .select($"id", $"n_terms", $"bm25")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(both.map(_._2).toSeq == Seq(2, 1))
    // doc 2 matches only "x": its combined score equals the x-only score
    assert(one.contains(both(1)._3))
    assert(both(0)._3 > both(1)._3, "extra matched term must add score")
  }

  test("plan: corpus never shuffles — one stats row broadcast back") {
    val docs = Seq((1L, "x", 4L)).toDF("id", "text", "len")
    val plan = Relevance.bm25(docs, "id", "text", "len", Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("BroadcastExchange"),
      s"stats row must broadcast, not shuffle the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"no corpus shuffle allowed:\n$plan")
  }

  test("rrf fuses by summed reciprocal rank, hand-computed") {
    // system A ranks 1,2,3; system B ranks 3,2,4. k=60.
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rk")
    val b = Seq((3L, 1), (2L, 2), (4L, 3)).toDF("id", "rk")
    val got = Relevance.rrf(Seq((a, "a"), (b, "b")), "id", "rk")
      .orderBy($"fused_rank")
      .select($"id", $"rank_a", $"rank_b", $"fused_rank")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getInt(3))).toSeq
    // contributions: id2 = 1/62+1/62, id3 = 1/63+1/61, id1 = 1/61, id4 = 1/63
    val byId = Map(1L -> (1.0 / 61), 2L -> (2.0 / 62),
      3L -> (1.0 / 63 + 1.0 / 61), 4L -> (1.0 / 63))
    val expect = byId.toSeq.sortBy { case (id, c) => (-c, id) }.map(_._1)
    assert(got.map(_._1) == expect)
    assert(got.map(_._4) == Seq(1, 2, 3, 4))
    // per-system rank columns: null (-1 here) where the system skipped it
    val m = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((1L, -1L)) && m(4L) == ((-1L, 3L)) && m(2L) == ((2L, 2L)))
  }

  test("rrf ties break by id ascending; single system is rank-identity") {
    // both docs ranked identically by the one system → equal contributions
    val a = Seq((9L, 1), (4L, 1)).toDF("id", "rk")
    val got = Relevance.rrf(Seq((a, "a")), "id", "rk")
      .orderBy($"fused_rank").select($"id").as[Long].collect().toSeq
    assert(got == Seq(4L, 9L))
    intercept[IllegalArgumentException] { Relevance.rrf(Seq.empty, "id", "rk") }
  }
}
