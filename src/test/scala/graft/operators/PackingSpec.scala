package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing + chunking invariants (the oracle gate covers the
  * driver queries; these pin the operator contracts on edge shapes). */
class PackingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("chunkDocs: full coverage, overlap contract, short-doc single chunk") {
    val docs = Seq(
      (1L, (1 to 125).map(i => s"t$i").mkString(" ")), // 3 chunks at 60/10
      (2L, (1 to 60).map(i => s"t$i").mkString(" ")),  // exactly one window
      (3L, "a b c"),                                    // shorter than window
      (4L, (1 to 61).map(i => s"t$i").mkString(" "))   // one token over
    ).toDF("doc_id", "text")
    val out = Packing.chunkDocs(docs, "text", "doc_id",
      maxTokens = 60, overlap = 10).orderBy("doc_id", "chunk_idx").collect()

    def chunksOf(id: Long) = out.filter(_.getLong(0) == id)
    assert(chunksOf(1L).length == 3 && chunksOf(2L).length == 1 &&
      chunksOf(3L).length == 1 && chunksOf(4L).length == 2)

    // chunk i starts at token i*step+1: consecutive chunks share exactly
    // `overlap` tokens, and the union re-covers the document in order
    val c1 = chunksOf(1L).map(_.getString(3).split(" ").toSeq)
    assert(c1(0).length == 60 && c1(1).length == 60 && c1(2).length == 25)
    assert(c1(0).takeRight(10) == c1(1).take(10), "10-token overlap")
    assert((c1(0) ++ c1(1).drop(10) ++ c1(2).drop(10)) ==
      (1 to 125).map(i => s"t$i"), "chunks reassemble the document")
    // declared token counts match the actual slices
    assert(out.forall(r => r.getLong(2) == r.getString(3).split(" ").length))
    // the one-over doc gets a 50-advance second chunk of 11 tokens
    assert(chunksOf(4L)(1).getLong(2) == 11)

    intercept[IllegalArgumentException] {
      Packing.chunkDocs(docs, "text", "doc_id", maxTokens = 10, overlap = 10)
    }
  }

  test("concatChunks: running offsets pack per stream, deterministic") {
    val df = Seq(
      ("s1", 1L, 400L), ("s1", 2L, 400L), ("s1", 3L, 400L),
      ("s2", 4L, 1000L), ("s2", 5L, 100L)
    ).toDF("stream", "id", "n_tok")
    val out = Packing.concatChunks(df, col("stream"), col("id"),
      col("n_tok"), capacity = 1024).orderBy("id").collect()
    // s1: offsets 0,400,800 -> chunks 0,0,0 ; s2: offsets 0,1000 -> 0,0
    assert(out.map(_.getAs[Long]("chunk")).toSeq == Seq(0L, 0L, 0L, 0L, 0L))
    assert(out.map(_.getAs[Long]("chunk_offset")).toSeq ==
      Seq(0L, 400L, 800L, 0L, 1000L))
    // independent of physical layout
    val again = Packing.concatChunks(df.repartition(8), col("stream"),
      col("id"), col("n_tok"), capacity = 1024).orderBy("id").collect()
    assert(out.toSeq == again.toSeq)
  }
}
