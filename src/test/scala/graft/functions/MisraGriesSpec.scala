package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def candidates(tokens: Seq[String], k: Int, parts: Int): Seq[String] =
    tokens.toDF("tok").repartition(parts)
      .agg(MisraGries.heavyHitterCandidates($"tok", k).as("c"))
      .collect()(0).getSeq[String](0)

  test("fewer distinct tokens than counters: every token survives exactly") {
    val toks = Seq("a", "b", "b", "c", "c", "c")
    assert(candidates(toks, k = 8, parts = 3).sorted == Seq("a", "b", "c"))
  }

  test("superset guarantee: every token over N/(k+1) is a candidate, across partitions") {
    // 3 heavy tokens drowning in 2000 singletons; k=15 counters ⇒ anything
    // over N/16 must survive the partial/merge pipeline regardless of how
    // rows land in partitions.
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(250)("gamma")
    val noise = (0 until 2000).map(i => s"tok$i")
    val toks = scala.util.Random.shuffle(heavy ++ noise)
    val n = toks.size
    for (parts <- Seq(1, 7)) {
      val cands = candidates(toks, k = 15, parts = parts).toSet
      val mustKeep = toks.groupBy(identity).collect {
        case (t, occ) if occ.size > n / 16 => t
      }
      assert(mustKeep.toSet.subsetOf(cands),
        s"parts=$parts lost ${mustKeep.toSet -- cands}")
      assert(cands.size <= 15)
    }
  }

  test("sketch-then-verify equals the exact groupBy answer") {
    val heavy = Seq.fill(90)("the") ++ Seq.fill(50)("of") ++ Seq.fill(30)("and")
    val noise = (0 until 400).map(i => s"w$i")
    val toks = scala.util.Random.shuffle(heavy ++ noise)
    val df = toks.toDF("tok").repartition(5)
    val n = toks.size.toLong
    // threshold N/20; k=64 counters ⇒ guarantee holds (N/65 < N/20)
    val cands = df.agg(MisraGries.heavyHitterCandidates($"tok", 64).as("c"))
      .collect()(0).getSeq[String](0)
    val verified = df.filter($"tok".isin(cands: _*))
      .groupBy($"tok").agg(count(lit(1)).as("n"))
      .filter($"n" * 20L > lit(n))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * 20L > n => t -> occ.size.toLong
    }
    assert(verified == exact)
  }

  test("nulls are ignored, empty input yields an empty candidate set") {
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("tok")
    assert(withNulls.agg(MisraGries.heavyHitterCandidates($"tok", 4))
      .collect()(0).getSeq[String](0) == Seq("x"))
    val empty = Seq.empty[String].toDF("tok")
    assert(empty.agg(MisraGries.heavyHitterCandidates($"tok", 4))
      .collect()(0).getSeq[String](0).isEmpty)
  }
}
