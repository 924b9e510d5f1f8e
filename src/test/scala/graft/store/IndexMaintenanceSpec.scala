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

  test("ValueIndex: random mutation interleavings, refresh == re-projection") {
    val rnd = new scala.util.Random(1042)
    def v(i: Long): String =
      if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(6)}"
    val src = new GraftTable(spark, freshCat(), "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("v", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
    src.createMany((1L to 25L).map(i => (i, v(i))).toDF("doc_id", "v"))
    val idx = ValueIndex.build(src, "m", "v", "doc_id", nBuckets = 4)

    def expect() = ValueIndex.bucketed(
      ValueIndex.postingsOf(src.snapshot(), Seq("v"), "doc_id"), Seq("v"), 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    def got() = idx.post.snapshot()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet

    var nextId = 100L
    (1 to 12).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 =>
          val ids = (nextId until nextId + 1 + rnd.nextInt(3)).toSeq
          nextId += ids.size
          src.createMany(ids.map(i => (i, v(i))).toDF("doc_id", "v"))
        case 1 => // value-moving updates (possibly to null = de-indexing)
          val lo = 1L + rnd.nextInt(20)
          val t = v(nextId + 7919L)
          src.updateMany(graft.query.RawCol(
            col("doc_id") >= lo && col("doc_id") < lo + 3),
            Map("v" ->
              (if (t == null) lit(null).cast("string") else lit(t))))
        case 2 =>
          val lo = 1L + rnd.nextInt(25)
          src.deleteMany(graft.query.RawCol(
            col("doc_id") >= lo && col("doc_id") < lo + 2))
        case _ => ()
      }
      if (rnd.nextInt(2) == 0) { idx.refresh(); () }
    }
    while (idx.refresh().nonEmpty) ()
    assert(got() == expect(),
      "posting table must equal a from-scratch projection of the snapshot")
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

  test("AnnIndex.rebuild retrains on the current snapshot and the cursor keeps draining") {
    def vec(i: Long): Seq[Float] =
      (0 until dim).map(j => ((i * 31 + j * 7) % 17).toFloat * 0.1f - 0.8f)
    val src = new GraftTable(spark, freshCat(), "vecs", StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true))),
      uniqueKeys = Seq(Seq("vec_id")))
    src.createMany((1L to 25L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val idx = AnnIndex.build(src, "m", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 1)
    // a drifted cohort arrives and drains under the FROZEN codebooks
    src.createMany((100L to 115L).map(i =>
      (i, (0 until dim).map(j => ((i + j) % 5).toFloat / 16.0f + 0.5f)))
      .toDF("vec_id", "embedding"))
    assert(idx.refresh().nonEmpty)
    val modelBefore = src.catalog.manifest()(idx.model.name)
    idx.rebuild(nCells = 2, m = 2, k = 4, iters = 1)
    assert(src.catalog.manifest()(idx.model.name) != modelBefore,
      "rebuild must swap the model slices (refresh never does)")
    // rebuild == retrain-from-scratch on the snapshot it saw
    val co = Pq.train(src.snapshot(), "embedding", "vec_id",
      m = 1, k = 2, iters = 1)
    val cb = Pq.train(src.snapshot(), "embedding", "vec_id",
      m = 2, k = 4, iters = 1)
    def codeSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet
    assert(codeSet(idx.codes.snapshot()) ==
      codeSet(Pq.encodeIvf(src.snapshot(), "embedding", "vec_id", co, cb)),
      "rebuilt codes must equal encode-all under freshly trained codebooks")
    assert(idx.refresh().isEmpty,
      "rebuild re-pins the cursor at its snapshot — nothing left to drain")
    // the loop continues: a post-rebuild delta drains with the NEW model
    src.createMany(Seq((200L, vec(200L))).toDF("vec_id", "embedding"))
    assert(idx.refresh().nonEmpty, "cursor must keep draining after rebuild")
    assert(codeSet(idx.codes.snapshot()) ==
      codeSet(Pq.encodeIvf(src.snapshot(), "embedding", "vec_id", co, cb)),
      "post-rebuild deltas encode under the rebuilt codebooks")
  }

  test("a rebuild that lost the race to a refresh fails P2034 and lands on retry") {
    def vec(i: Long): Seq[Float] =
      (0 until dim).map(j => ((i * 13 + j * 5) % 11).toFloat * 0.1f - 0.5f)
    val src = new GraftTable(spark, freshCat(), "vecs", StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true))),
      uniqueKeys = Seq(Seq("vec_id")))
    src.createMany((1L to 20L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val idx = AnnIndex.build(src, "m", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 1)
    // replay rebuild's staging by hand, but let a refresh COMMIT inside
    // the gap between the rebuild's base read and its commit — the
    // shared cursor key makes the stale rebuild fail the swap (P2034)
    val c0 = src.catalog.currentCommitId()
    val snap = src.snapshotAt(c0)
    val co = Pq.train(snap, "embedding", "vec_id", m = 1, k = 2, iters = 1)
    val cb = Pq.train(snap, "embedding", "vec_id", m = 2, k = 4, iters = 1)
    val staleBase = src.catalog.manifest().get(Catalog.StreamTable)
    src.createMany(Seq((50L, vec(50L))).toDF("vec_id", "embedding"))
    assert(idx.refresh().nonEmpty) // the refresh wins the race
    val txn = new Txn(src.catalog)
    txn.deleteMany(idx.codes, graft.query.RawCol(lit(true)))
    txn.createMany(idx.codes,
      Pq.encodeIvf(snap, "embedding", "vec_id", co, cb),
      skipDuplicates = false)
    txn.recordStreamBatch(src, "cdf:ann:m", c0, staleBase)
    intercept[ConcurrentModificationException] { txn.commit() }
    // nothing published by the failed swap; the retried rebuild lands
    // against the post-refresh state, like every other OCC writer
    graft.pipeline.Retry.onConflict() {
      idx.rebuild(nCells = 2, m = 2, k = 4, iters = 1)
    }
    val co2 = Pq.train(src.snapshot(), "embedding", "vec_id",
      m = 1, k = 2, iters = 1)
    val cb2 = Pq.train(src.snapshot(), "embedding", "vec_id",
      m = 2, k = 4, iters = 1)
    assert(idx.codes.snapshot().collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet ==
      Pq.encodeIvf(src.snapshot(), "embedding", "vec_id", co2, cb2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet,
      "the retried rebuild must cover the refresh's rows too")
  }

  test("vacuum never strands a lagging index cursor (slices or history)") {
    val src = new GraftTable(spark, freshCat(), "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
    def text(i: Long): String = s"doc $i body ${i % 5} filler shared words"
    src.createMany((1L to 25L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = DedupIndex.build(src, "v", "text", "doc_id", nBuckets = 4)
    // mutate WITHOUT refreshing — the cursor now lags behind head, and
    // its next drain needs the cursor manifest + its slice versions as
    // the preimage baseline
    src.updateMany(graft.query.RawCol(col("doc_id") <= 5L),
      Map("text" -> lit(text(777L))))
    src.deleteMany(graft.query.RawCol(col("doc_id") > 20L))
    src.createMany(Seq((30L, text(30L))).toDF("doc_id", "text"))
    // the most aggressive retention: without cursor-aware pinning this
    // reclaims exactly the versions and the history manifest the lagging
    // refresh is about to read
    src.catalog.vacuum(retainMs = 0, keepHistory = 1)
    while (idx.refresh().nonEmpty) ()
    assert(idx.sketch.snapshot().select($"id", $"sh", $"sig")
        .collect().toSet ==
      Dedup.minhashIndex(src.snapshot(), "text", "doc_id", 3, 32)
        .collect().toSet,
      "a lagging cursor must survive vacuum(0) and land exactly")
    // caught up: the cursor pins only head now, vacuum stays safe
    src.catalog.vacuum(retainMs = 0, keepHistory = 1)
    assert(idx.refresh().isEmpty)
    assert(idx.sketch.snapshot().count() == src.snapshot().count())
  }

  test("vacuum surfaces a cursor whose archived manifest is already gone") {
    val src = new GraftTable(spark, freshCat(), "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
    def text(i: Long): String = s"doc $i body ${i % 3} shared filler"
    src.createMany((1L to 10L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = DedupIndex.build(src, "v", "text", "doc_id", nBuckets = 2)
    src.createMany(Seq((20L, text(20L))).toDF("doc_id", "text"))
    // a lagging but HEALTHY cursor: vacuum pins it, reports nothing
    assert(src.catalog.vacuum(retainMs = 0, keepHistory = 1).isEmpty,
      "a protectable cursor is pinned, not reported")
    // simulate a legacy (pre-cursor-aware) vacuum that reclaimed the
    // cursor's archived manifest out-of-band
    val cur = idx.currentThrough()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      src.catalog.root, "_history", s"$cur.json"))
    val stranded = src.catalog.vacuum(retainMs = 0, keepHistory = 1)
    assert(stranded.contains(("docs", cur)),
      s"vacuum must surface the unrecoverable cursor, got $stranded")
  }

  test("compaction of a bucket-partitioned index table preserves pruning") {
    val src = new GraftTable(spark, freshCat(), "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
    def text(i: Long): String = s"word${i} doc $i shared filler body"
    src.createMany((1L to 40L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "c", "text", "doc_id", nBuckets = 4)
    // a few refreshes fragment the bucket slices (each upsert writes a
    // fresh file set per touched slice)
    (41L to 44L).foreach { i =>
      src.createMany(Seq((i, text(i))).toDF("doc_id", "text"))
      while (idx.refresh().nonEmpty) ()
    }
    val before = Bm25Index.postingsOf(src.snapshot(), "text", "doc_id")
      .as[(String, Long, Int, Int)].collect().toSet
    assert(idx.post.compact(maxFiles = 0) == 4,
      "every bucket slice must compact")
    // partition-scoped pruning must survive the rewrite: a one-bucket
    // predicate keeps exactly one slice dir, and the files the scan
    // plans over all live under it
    val b = Seq("word7").toDF("term")
      .select(pmod(xxhash64($"term"), lit(4)).cast("int"))
      .collect()(0).getInt(0)
    val (kept, total) = idx.post.prunedDirs(col("bucket") === b)
    assert(total == 4 && kept.size == 1,
      s"post-compaction pruning must keep 1 of 4 slices, kept $kept")
    val scan = idx.post.snapshotWhere(col("bucket") === b && $"term" === "word7")
    assert(scan.inputFiles.nonEmpty &&
      scan.inputFiles.forall(_.contains(s"/${idx.post.name}/bucket=$b/")),
      "the pruned scan must plan only the probed bucket's files")
    // and the data is untouched: postings and search agree with pre-compact
    assert(idx.post.snapshot().select($"term", $"id", $"tf", $"dl")
      .as[(String, Long, Int, Int)].collect().toSet == before)
    assert(idx.search(Seq("word7")).select($"doc_id").as[Long]
      .collect().toSeq == Seq(7L))
  }

  test("restoreTo flows through every index refresh as inverse deltas") {
    // corrupt → restore → refresh must land each index exactly where a
    // fresh derivation of the restored snapshot would — the rollback is
    // delta-priced un-indexing, never a rebuild, and mutations AFTER the
    // restore keep composing on the same cursor.
    def mkDocs(): GraftTable = new GraftTable(spark, freshCat(), "docs",
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
    def text(i: Long): String = s"doc $i body ${i % 5} filler shared words"
    def corruptRestoreMutate(src: GraftTable, refresh: () => Unit): Unit = {
      val good = src.catalog.currentCommitId()
      src.createMany(Seq((900L, text(900L)), (901L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
      src.updateMany(graft.query.RawCol(col("doc_id") <= 5L),
        Map("text" -> lit("corrupted payload")))
      src.deleteMany(graft.query.RawCol(col("doc_id") > 20L))
      refresh() // the bad window reaches the index first
      src.restoreTo(good)
      refresh() // the rollback arrives as inverse deltas
      // and life goes on after the restore, same cursor
      src.createMany(Seq((950L, text(950L))).toDF("doc_id", "text"))
      refresh()
    }

    // DedupIndex
    val d = mkDocs()
    d.createMany((1L to 25L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val di = DedupIndex.build(d, "r", "text", "doc_id", nBuckets = 4)
    corruptRestoreMutate(d, () => while (di.refresh().nonEmpty) ())
    assert(di.sketch.snapshot().select($"id", $"sh", $"sig").collect().toSet ==
      Dedup.minhashIndex(d.snapshot(), "text", "doc_id", 3, 32)
        .collect().toSet,
      "dedup sketches must equal a fresh build on the restored+mutated state")

    // Bm25Index
    val b = mkDocs()
    b.createMany((1L to 25L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val bi = Bm25Index.build(b, "r", "text", "doc_id", nBuckets = 4)
    corruptRestoreMutate(b, () => while (bi.refresh().nonEmpty) ())
    assert(bi.post.snapshot().select($"term", $"id", $"tf", $"dl")
        .as[(String, Long, Int, Int)].collect().toSet ==
      Bm25Index.postingsOf(b.snapshot(), "text", "doc_id")
        .as[(String, Long, Int, Int)].collect().toSet,
      "postings must equal a fresh tokenize of the restored+mutated state")
    val expectScalars = b.snapshot().agg(count(lit(1)),
      coalesce(sum(size(filter(split(coalesce($"text", lit("")), " "),
        t => t =!= lit(""))).cast("long")), lit(0L))).collect()(0)
    val (n, s, _) = bi.stats()
    assert(n == expectScalars.getLong(0) && s == expectScalars.getLong(1),
      "scalar fold must survive the restore round-trip")

    // AnnIndex (frozen codebooks; re-encode of the restored state)
    val v = new GraftTable(spark, freshCat(), "vecs", StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true))),
      uniqueKeys = Seq(Seq("vec_id")))
    def vec(i: Long): Seq[Float] =
      (0 until dim).map(j => ((i * 31 + j * 7) % 17).toFloat * 0.1f - 0.8f)
    v.createMany((1L to 25L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val ai = AnnIndex.build(v, "r", "embedding", "vec_id",
      nCells = 2, m = 2, k = 4, iters = 1)
    val good = v.catalog.currentCommitId()
    v.deleteMany(graft.query.RawCol(col("vec_id") > 15L))
    v.updateMany(graft.query.RawCol(col("vec_id") <= 3L),
      Map("embedding" -> lit(null).cast("array<float>")))
    while (ai.refresh().nonEmpty) ()
    v.restoreTo(good)
    v.createMany(Seq((950L, vec(950L))).toDF("vec_id", "embedding"))
    while (ai.refresh().nonEmpty) ()
    val (coarse, cb) = ai.codebooks()
    assert(ai.codes.snapshot().collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet ==
      Pq.encodeIvf(v.snapshot(), "embedding", "vec_id", coarse, cb).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList)).toSet,
      "codes must equal a re-encode of the restored+mutated state")
  }
}
