package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** [[UnigramLm]] — hard-EM unigram-LM training: the worked example
  * (hand-derivable, Kudo-2018 style), the Viterbi tie-break contract,
  * coverage floors, and pruning. */
class UnigramLmSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def micro(c: Long, t: Long): Long =
    math.round(math.log(c.toDouble / t.toDouble) * 1e6)

  test("worked example: seed, Viterbi, prune, rescore — by hand") {
    // corpus: abab x3, ab x2.
    // SEED (occurrence-counted, freq-weighted):
    //   a=8, b=8, ab=8, ba=3, aba=3, bab=3, abab=3   (total 36)
    // round 1 Viterbi under ln(c/36) scores:
    //   'abab' -> [abab]  (one 3/36 piece beats two 8/36 pieces:
    //             ln(3/36) = -2.48 > 2*ln(8/36) = -3.01)
    //   'ab'   -> [ab]
    // M-step: abab=3, ab=2; ba/aba/bab PRUNED (unused multi-char);
    //         a=b=1 (single-char floor). total 7.
    // round 2 reproduces the same segmentation -> fixed point.
    val docs = Seq("abab abab abab ab ab").toDF("text")
    val out = UnigramLm.train(docs, "text", maxPieceLen = 4,
      maxWordLen = 8, minSeedCount = 2, iters = 2)
      .orderBy(col("piece")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a", 1L, micro(1, 7)),
      ("ab", 2L, micro(2, 7)),
      ("abab", 3L, micro(3, 7)),
      ("b", 1L, micro(1, 7))))
  }

  test("segmentWords: the worked example's words segment as trained") {
    val docs = Seq("abab abab abab ab ab").toDF("text")
    val segs = UnigramLm.segmentWords(docs, "text", maxPieceLen = 4,
      maxWordLen = 8, minSeedCount = 2, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    // under the trained scores the whole-word pieces win outright
    assert(segs.toSeq == Seq(("ab", 1L, "ab"), ("abab", 1L, "abab")))
  }

  test("fixed point: a third EM round changes nothing") {
    val docs = Seq("abab abab abab ab ab").toDF("text")
    def run(iters: Int) = UnigramLm.train(docs, "text", maxPieceLen = 4,
      maxWordLen = 8, minSeedCount = 2, iters = iters)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(2) == run(3))
  }

  test("single characters below the seed threshold are floor-kept") {
    // 'c' appears once (< minSeedCount) but must survive seeding AND
    // the M-step floor — otherwise 'abc' becomes unsegmentable
    val docs = Seq("ab ab ab ab abc").toDF("text")
    val out = UnigramLm.train(docs, "text", maxPieceLen = 2,
      maxWordLen = 8, minSeedCount = 3, iters = 2)
      .collect().map(r => r.getString(0)).toSet
    assert(out.contains("c"))
    assert(out.contains("a") && out.contains("b"))
  }

  test("Viterbi kernel: exact ties break toward the longest piece") {
    val vocab = new java.util.HashMap[String, java.lang.Long]()
    vocab.put("a", -100L); vocab.put("aa", -200L) // [aa] ties [a,a]
    val seg = UnigramKernels.segment(
      org.apache.spark.unsafe.types.UTF8String.fromString("aa"), vocab, 4)
    assert(seg.numElements() == 1)
    assert(seg.getUTF8String(0).toString == "aa")
    // no tie: strictly better split wins
    vocab.put("aa", -250L)
    val seg2 = UnigramKernels.segment(
      org.apache.spark.unsafe.types.UTF8String.fromString("aa"), vocab, 4)
    assert(seg2.numElements() == 2)
  }

  test("Viterbi kernel: unreachable word yields empty, never throws") {
    val vocab = new java.util.HashMap[String, java.lang.Long]()
    vocab.put("a", -100L)
    val seg = UnigramKernels.segment(
      org.apache.spark.unsafe.types.UTF8String.fromString("ax"), vocab, 4)
    assert(seg.numElements() == 0)
  }

  test("training is deterministic across input partitionings") {
    val docs = Seq.tabulate(40)(i => s"token$i word word$i common text")
      .toDF("text")
    def run(parts: Int) = UnigramLm.train(docs.repartition(parts), "text",
      minSeedCount = 3, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(1) == run(5))
  }
}
