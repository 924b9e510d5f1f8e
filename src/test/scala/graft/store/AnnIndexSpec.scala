package graft.store

import graft.SparkTestBase
import graft.operators.Pq
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent ANN index: build-once/probe-forever, CDF-incremental
  * maintenance with the PERSISTED codebooks (never a retrain), and the
  * partition-scoped probe scan. */
class AnnIndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val dim = 8

  // deterministic synthetic embeddings: two well-separated blobs so the
  // coarse quantizer has structure to find
  private def vec(id: Long): Seq[Float] = {
    val base = if (id % 2 == 0) 0.1f else 0.9f
    (0 until dim).map(j => base + ((id * 31 + j * 7) % 10) * 0.01f)
  }

  private def srcTable(): GraftTable = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-annidx").toString)
    new GraftTable(spark, cat, "vecs", StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true))),
      uniqueKeys = Seq(Seq("vec_id")))
  }

  private def load(t: GraftTable, ids: Seq[Long]): Unit =
    t.createMany(ids.map(i => (i, vec(i))).toDF("vec_id", "embedding"))

  private def codeRows(t: GraftTable): Set[(Long, Int, Seq[Int])] =
    t.snapshot().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList: Seq[Int]))
      .toSet

  test("build persists model + codes + cursor atomically; open() probes without training") {
    val src = srcTable()
    load(src, 1L to 40L)
    val idx = AnnIndex.build(src, "t", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 2)
    val (coarse, cb) = idx.codebooks()
    assert(coarse.k == 2 && cb.m == 2 && cb.k == 4 && cb.ds == dim / 2)
    assert(idx.currentThrough() == src.catalog.currentCommitId() - 1,
      "cursor pins the encoded source commit (build itself adds one commit)")
    // a reopened handle (no training path exists on it) answers self-hit
    // rank 1 for a corpus vector — the PQ self-distance is 0
    val q = Seq((7L, vec(7L))).toDF("qid", "embedding")
    val hit = AnnIndex.open(src, "t", "embedding", "vec_id")
      .search(q, "qid", nProbe = 1, topk = 3)
      .filter(col("rank") === 1).select("id").as[Long].head()
    assert(hit == 7L)
  }

  test("refresh applies the change feed with the persisted codebooks — no retrain") {
    val src = srcTable()
    load(src, 1L to 30L)
    val idx = AnnIndex.build(src, "t", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 2)
    val (coarse, cb) = idx.codebooks()
    val modelBefore = src.catalog.manifest()(idx.model.name)

    load(src, 31L to 45L) // inserts
    src.updateMany(graft.query.RawCol(col("vec_id") === 3L),
      Map("embedding" -> typedLit(vec(99L)))) // embedding change
    src.deleteMany(graft.query.RawCol(col("vec_id") > 28L && col("vec_id") <= 30L))

    assert(idx.refresh().nonEmpty, "the mutation window must drain")
    assert(idx.refresh().isEmpty, "caught up: second refresh is a no-op")
    assert(src.catalog.manifest()(idx.model.name) == modelBefore,
      "refresh must not touch the model slices (zero training jobs)")

    // the refreshed codes equal a from-scratch re-encode of the FINAL
    // corpus under the SAME persisted codebooks — the exact contract
    // (a full rebuild would retrain and is a different index)
    val expect = Pq.encodeIvf(src.snapshot(), "embedding", "vec_id", coarse, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList: Seq[Int])).toSet
    assert(codeRows(idx.codes) == expect)
  }

  test("searchRerank: exact final order from the persisted shortlist") {
    val src = srcTable()
    load(src, 1L to 40L)
    val idx = AnnIndex.build(src, "t", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 2)
    val q = Seq((11L, vec(11L))).toDF("qid", "embedding")
    val got = idx.searchRerank(q, "qid", nProbe = 2, shortlist = 10, topk = 3)
      .orderBy(col("rank")).select("id").as[Long].collect().toSeq
    // the synthetic vectors repeat with period 20, so vec(11) == vec(1)
    // == vec(31): the exact re-rank ties all three at distance 0 and the
    // id tie-break picks the smallest — exactly the deterministic
    // contract (an ADC-only rank could order the tied trio arbitrarily
    // by code collision)
    assert(got.head == 1L, s"smallest distance-0 twin wins, got ${got.head}")
    // reference: exact milli distance over the same ADC shortlist
    val cand = idx.search(q, "qid", nProbe = 2, topk = 10)
      .select("id").as[Long].collect().toSeq
    def milli(v: Seq[Float]): Seq[Long] =
      v.map(x => math.max(-2000L, math.min(2000L,
        math.round(x.toDouble * 1000))) + 2000L)
    val qe = milli(vec(11L))
    val expect = cand.map(id => (id, milli(vec(id)).zip(qe)
        .map { case (a, b) => (a - b) * (a - b) }.sum))
      .sortBy { case (id, d) => (d, id) }.take(3).map(_._1)
    assert(got == expect)
  }

  test("a postimage that goes malformed DELETES its codes — no stale searchable vector") {
    val src = srcTable()
    load(src, 1L to 20L)
    val idx = AnnIndex.build(src, "t", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 1)
    assert(idx.codes.snapshot().filter(col("id") === 5L).count() == 1)
    // the embedding of vec 5 is nulled: the encode's null/NaN policy
    // drops the row, so the refresh must explicitly remove the old codes
    src.updateMany(graft.query.RawCol(col("vec_id") === 5L),
      Map("embedding" -> lit(null).cast("array<float>")))
    assert(idx.refresh().nonEmpty)
    assert(idx.codes.snapshot().filter(col("id") === 5L).count() == 0,
      "stale codes for a malformed vector must not stay searchable")
    // and a later repair re-enters the index
    src.updateMany(graft.query.RawCol(col("vec_id") === 5L),
      Map("embedding" -> typedLit(vec(5L))))
    assert(idx.refresh().nonEmpty)
    assert(idx.codes.snapshot().filter(col("id") === 5L).count() == 1)
  }

  test("a refresh spanning a restoreTo converges the index to the restored corpus") {
    val src = srcTable()
    load(src, 1L to 30L)
    val idx = AnnIndex.build(src, "t", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 2)
    val (coarse, cb) = idx.codebooks()
    val good = src.catalog.currentCommitId()
    // bad batch: inserts + an embedding rewrite + deletes, then rollback
    load(src, 31L to 40L)
    src.updateMany(graft.query.RawCol(col("vec_id") === 5L),
      Map("embedding" -> typedLit(vec(77L))))
    src.deleteMany(graft.query.RawCol(col("vec_id") > 25L && col("vec_id") <= 30L))
    assert(idx.refresh().nonEmpty, "the bad window drains into the index")
    src.restoreTo(good)
    assert(idx.refresh().nonEmpty, "the rollback window drains as inverse deltas")
    assert(idx.refresh().isEmpty)
    // the index equals a fresh encode of the restored corpus under the
    // same persisted codebooks — restore left no orphan or stale codes
    val expect = Pq.encodeIvf(src.snapshot(), "embedding", "vec_id", coarse, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toList: Seq[Int])).toSet
    assert(codeRows(idx.codes) == expect)
    assert(expect.size == 30)
  }

  test("search reads only the probed cells' slices") {
    val src = srcTable()
    load(src, 1L to 40L)
    val idx = AnnIndex.build(src, "t", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 2)
    // the codes table is partitioned by cell — one slice per cell
    assert(src.catalog.manifest()(idx.codes.name).keySet.size == 2)
    // a 1-probe query restricts the scan to its single probed cell —
    // assert through the same pruning machinery search() drives
    // (snapshotWhere on the probed-cell predicate): 1 of 2 slices kept
    val q = Seq((2L, vec(2L))).toDF("qid", "embedding")
    val (coarse, _) = idx.codebooks()
    val probedCell = Pq.probeFrame(q, "embedding", "qid", coarse, nProbe = 1)
      .select("cell").as[Int].head()
    val (kept, total) = idx.codes.prunedDirs(col("cell") === probedCell)
    assert(total == 2 && kept.size == 1,
      s"probe must keep ONE of two cell slices, kept ${kept.size}/$total")
    val res = idx.search(q, "qid", nProbe = 1, topk = 5)
    assert(res.filter(col("rank") === 1).select("id").as[Long].head() == 2L)
  }
}
