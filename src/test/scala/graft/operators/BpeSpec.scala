package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("train reproduces the classic worked example, ties broken by pair text") {
    // Sennrich et al. 2016 vocabulary: low×5, lower×2, newest×6, widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val out = Bpe.train(Seq(text).toDF("text"), "text", numMerges = 5)
      .orderBy($"step").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      // (e,s)=9 ties (s,t)=9 → "e s" < "s t"
      (1L, "e s", 9L),
      (2L, "es t", 9L),
      // (l,o)=7 ties (o,w)=7 → "l o"
      (3L, "l o", 7L),
      (4L, "lo w", 7L),
      // (e,w)=6 ties (n,e)=6 and (w,est)=6 → "e w" first
      (5L, "e w", 6L)))
  }

  test("self-pair runs coalesce to fixpoint, merge count is weighted") {
    // "aaaa"×3: step 1 merges (a,a)=9 (3 adjacent pairs × 3 occurrences);
    // fixpoint application leaves no lone ' a a ' anywhere
    val out = Bpe.train(Seq("aaaa aaaa aaaa").toDF("text"), "text",
        numMerges = 2)
      .orderBy($"step").as[(Long, String, Long)].collect().toSeq
    assert(out.head == (1L, "a a", 9L))
    // after ' a a '→' aa ' to fixpoint, 'aaaa' is [aa, aa] → next merge
    // is (aa,aa)=3
    assert(out(1) == (2L, "aa aa", 3L))
  }

  test("stops early when the corpus runs out of pairs") {
    val out = Bpe.train(Seq("ab ab").toDF("text"), "text", numMerges = 5)
      .orderBy($"step").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a b", 2L)))
  }

  test("segment applies trained merges in order to every distinct word") {
    // Sennrich corpus, 3 merges: es, est, lo
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val seg = Bpe.segment(Seq(text).toDF("text"), "text", numMerges = 3)
      .as[(String, Long, String)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(seg("low") == ((2L, "lo w")))
    assert(seg("lower") == ((4L, "lo w e r")))
    assert(seg("newest") == ((4L, "n e w est")))
    assert(seg("widest") == ((4L, "w i d est")))
  }
}
