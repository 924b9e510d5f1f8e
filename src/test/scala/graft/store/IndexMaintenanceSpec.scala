package graft.store

import graft.SparkTestBase
import graft.operators.{Dedup, Pq}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** THE maintenance invariant both persistent indexes promise: after any
  * interleaving of inserts / updates / deletes / malformed rows and any
  * drain cadence, the index equals a from-scratch re-derivation of the
  * CURRENT source snapshot under the PERSISTED parameters. A seeded
  * random op sequence walks the state space far past what the
  * hand-written cases cover (update-then-delete of the same id in one
  * window, malform-then-repair, delete-then-reinsert, empty windows). */
class IndexMaintenanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 8

  private def freshCat() = new Catalog(
    java.nio.file.Files.createTempDirectory("graft-idxmaint").toString)

  test("DedupIndex: random mutation interleavings, refresh == re-sketch") {
    val rnd = new scala.util.Random(42)
    def text(i: Long): String =
      if (rnd.nextInt(10) == 0) null // occasional null text
      else s"doc $i body ${rnd.nextInt(5)} filler words shared across"
    val src = new GraftTable(spark, freshCat(), "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
    src.createMany((1L to 25L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = DedupIndex.build(src, "m", "text", "doc_id", nBuckets = 4)

    def expect() = Dedup.minhashIndex(src.snapshot(), "text", "doc_id", 3, 32)
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[Long](1)).map(_.toList).orNull,
        Option(r.getSeq[Long](2)).map(_.toList).orNull)).toSet
    def got() = idx.sketch.snapshot().collect().map(r => (r.getLong(0),
      Option(r.getSeq[Long](1)).map(_.toList).orNull,
      Option(r.getSeq[Long](2)).map(_.toList).orNull)).toSet

    var nextId = 100L
    (1 to 12).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // insert a small batch
          val ids = (nextId until nextId + 1 + rnd.nextInt(3)).toSeq
          nextId += ids.size
          src.createMany(ids.map(i => (i, text(i))).toDF("doc_id", "text"))
        case 1 => // update a random live band of ids (possibly to null)
          val lo = 1L + rnd.nextInt(20)
          val t = text(nextId + 7919L)
          src.updateMany(graft.query.RawCol(
            col("doc_id") >= lo && col("doc_id") < lo + 3),
            Map("text" ->
              (if (t == null) lit(null).cast("string") else lit(t))))
        case 2 => // delete a random band
          val lo = 1L + rnd.nextInt(25)
          src.deleteMany(graft.query.RawCol(
            col("doc_id") >= lo && col("doc_id") < lo + 2))
        case _ => () // empty window: drain cadence without a source move
      }
      if (rnd.nextInt(2) == 0) { // drain on a random cadence, not per-op
        idx.refresh()
        ()
      }
    }
    while (idx.refresh().nonEmpty) ()
    assert(got() == expect(),
      "sketch table must equal a from-scratch re-sketch of the snapshot")
  }

  test("AnnIndex: random mutation interleavings incl. malformed, refresh == re-encode") {
    val rnd = new scala.util.Random(7)
    def vec(i: Long): Seq[Float] =
      if (rnd.nextInt(8) == 0) null // occasional malformed embedding
      else (0 until dim).map(j =>
        ((i * 31 + j * 7) % 17).toFloat * 0.1f - 0.8f)
    val src = new GraftTable(spark, freshCat(), "vecs", StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true))),
      uniqueKeys = Seq(Seq("vec_id")))
    src.createMany((1L to 25L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val idx = AnnIndex.build(src, "m", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 1)
    val (coarse, cb) = idx.codebooks()

    def expect() = Pq.encodeIvf(src.snapshot(), "embedding", "vec_id",
        coarse, cb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    def got() = idx.codes.snapshot().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet

    var nextId = 100L
    (1 to 12).foreach { step =>
      rnd.nextInt(4) match {
        case 0 =>
          val ids = (nextId until nextId + 1 + rnd.nextInt(3)).toSeq
          nextId += ids.size
          src.createMany(ids.map(i => (i, vec(i))).toDF("vec_id", "embedding"))
        case 1 =>
          val lo = 1L + rnd.nextInt(20)
          val v = vec(nextId + 104729L)
          src.updateMany(graft.query.RawCol(
            col("vec_id") >= lo && col("vec_id") < lo + 3),
            Map("embedding" ->
              (if (v == null) lit(null).cast("array<float>") else typedLit(v))))
        case 2 =>
          val lo = 1L + rnd.nextInt(25)
          src.deleteMany(graft.query.RawCol(
            col("vec_id") >= lo && col("vec_id") < lo + 2))
        case _ => ()
      }
      if (rnd.nextInt(2) == 0) {
        idx.refresh()
        ()
      }
    }
    while (idx.refresh().nonEmpty) ()
    assert(got() == expect(),
      "codes table must equal a from-scratch re-encode under the " +
        "persisted codebooks (malformed rows absent from both sides)")
  }
}
