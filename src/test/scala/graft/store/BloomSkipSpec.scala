package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file bloom-filter skipping: point lookups on a high-cardinality
  * UNSORTED column prune files whose min/max ranges all overlap — the
  * case range stats and z-order can never win. The write pays a
  * parquet-native bloom per file (no extra scan); the sidecar lifts the
  * filter bytes; both pruning sites (FileIndex relation and
  * snapshotWhere) reject files whose blooms provably lack the value. */
class BloomSkipSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic unsorted key for row i — md5 hex, so every file's
    * key range spans essentially the whole key space. */
  private def key(i: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private def seeded(): GraftTable = {
    val t = new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-bloom").toString),
      "docs", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("key", StringType, nullable = false),
        StructField("ref", LongType, nullable = false))),
      bloomCols = Seq("key", "ref"), bloomNdv = 1024L)
    // ref is a scrambled long (byte-reversed id): unsorted like key, so
    // its per-file ranges overlap too — the i64 bloom path
    val rows = (0L until 600L).map(i => (i, key(i), java.lang.Long.reverse(i)))
    // 6 files whose id/key/ref ranges all overlap (round-robin layout)
    t.createMany(rows.toDF("id", "key", "ref").repartition(6, pmod($"id", lit(6))))
    t
  }

  test("sidecar carries per-file blooms for the declared columns only") {
    val t = seeded()
    val dirs = t.catalog.currentDirs("docs").values.toSeq
    assert(dirs.size == 1)
    val st = SliceStats.readSidecar(dirs.head).get
    assert(st.files.size >= 2, "fixture must produce multiple files")
    st.files.values.filter(_.rows > 0).foreach { fs =>
      assert(fs.blooms.keySet == Set("key", "ref"), fs.blooms.keySet)
      assert(fs.blooms("key").ptype == "bin")
      assert(fs.blooms("ref").ptype == "i64")
      assert(fs.blooms.values.forall(_.bitsets.nonEmpty))
    }
    // ranges genuinely overlap: min/max alone cannot prune a point lookup
    val datafiles = st.files.values.filter(_.rows > 0).toSeq
    val mins = datafiles.map(_.cols("key").min.get.asInstanceOf[String])
    val maxs = datafiles.map(_.cols("key").max.get.asInstanceOf[String])
    assert(mins.max < maxs.min, "fixture key ranges must overlap")
  }

  test("string point lookup prunes to the one file that can match") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    val got = df.filter($"key" === key(42L)).select("id").as[Long].collect()
    assert(got.toSeq == Seq(42L))
    assert(idx.lastTotalFiles >= 2)
    assert(idx.lastKeptFiles < idx.lastTotalFiles,
      s"bloom must prune: kept ${idx.lastKeptFiles} of ${idx.lastTotalFiles}")
  }

  test("fully-dictionary-encoded chunks get a synthesized bloom and still prune") {
    // values repeating ~10x stay DICTIONARY-encoded, and parquet-mr then
    // drops the writer bloom (the dictionary is exact) — scan-time
    // readers cope, but planning-time pruning lost everything until the
    // sidecar learned to synthesize the bitset from the dictionary
    // entries. This is the common 100 TB shape (moderately-repeated
    // keys), caught live at the sf1 probe.
    val t = new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-bloomd").toString),
      "docs", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("key", StringType, nullable = false))),
      bloomCols = Seq("key"), bloomNdv = 1024L)
    // 600 rows, 60 distinct keys (10 copies each, copies co-located by
    // the grouping key) → every chunk dictionary-encodes
    val rows = (0L until 600L).map(i => (i, key(i % 60)))
    t.createMany(rows.toDF("id", "key").repartition(6, pmod($"id" % 60, lit(6))))
    val dirs = t.catalog.currentDirs("docs").values.toSeq
    val st = SliceStats.readSidecar(dirs.head).get
    assert(st.files.values.filter(_.rows > 0).forall(_.blooms.contains("key")),
      "dict-encoded files must carry a synthesized bloom")
    val (df, idx) = t.snapshotRelationWithIndex()
    val got = df.filter($"key" === key(42L)).select("id").as[Long].collect()
    assert(got.sorted.toSeq == Seq(42L, 102L, 162L, 222L, 282L, 342L,
      402L, 462L, 522L, 582L))
    assert(idx.lastTotalFiles >= 2 && idx.lastKeptFiles < idx.lastTotalFiles,
      s"synthesized bloom must prune: kept ${idx.lastKeptFiles} of ${idx.lastTotalFiles}")
    // an absent key still rejects (the synthesized bitset is a real bloom)
    df.filter($"key" === key(9999L)).count()
    assert(idx.lastKeptFiles <= 1)
  }

  test("i64 point lookup prunes through the long bloom") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    val got = df.filter($"ref" === java.lang.Long.reverse(77L))
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(77L))
    assert(idx.lastKeptFiles < idx.lastTotalFiles,
      s"kept ${idx.lastKeptFiles} of ${idx.lastTotalFiles}")
  }

  test("an absent key rejects every file (modulo bloom false positives)") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    assert(df.filter($"key" === "not-a-key").count() == 0L)
    // 1% FPP over a handful of files: a stray false positive is
    // tolerable, keeping everything is not
    assert(idx.lastKeptFiles < idx.lastTotalFiles)
  }

  test("IN lists prune to the union of candidate files") {
    val t = seeded()
    val (df, idx) = t.snapshotRelationWithIndex()
    val got = df.filter($"key".isin(key(3L), key(4L)))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(3L, 4L))
    assert(idx.lastKeptFiles < idx.lastTotalFiles)
  }

  test("snapshotWhere prunes through the same blooms") {
    val t = seeded()
    val (_, kept, total) = t.prunedPaths($"key" === key(123L))
    assert(total >= 2 && kept < total, s"kept $kept of $total")
    val got = t.snapshotWhere($"key" === key(123L))
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(123L))
  }

  test("non-equality predicates ignore blooms and stay correct") {
    val t = seeded()
    val (df, _) = t.snapshotRelationWithIndex()
    val p = $"key" >= "f0" // range over the bloom column
    val a = df.filter(p).orderBy("id").select("id").as[Long].collect().toSeq
    val b = t.snapshot().filter(p).orderBy("id").select("id").as[Long]
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("bloomless tables and columns never consult a bloom") {
    val t = new GraftTable(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-nobloom").toString),
      "plain", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("key", StringType, nullable = false))))
    t.createMany((0L until 100L).map(i => (i, key(i))).toDF("id", "key")
      .repartition(4, pmod($"id", lit(4))))
    val dirs = t.catalog.currentDirs("plain").values.toSeq
    val st = SliceStats.readSidecar(dirs.head).get
    assert(st.files.values.forall(_.blooms.isEmpty))
    val (df, idx) = t.snapshotRelationWithIndex()
    assert(df.filter($"key" === key(9L)).count() == 1L)
    assert(idx.lastKeptFiles == idx.lastTotalFiles,
      "overlapping ranges, no blooms: nothing may be skipped")
  }

  test("sidecar bloom section round-trips through render/parse") {
    val t = seeded()
    val dir = t.catalog.currentDirs("docs").values.head
    val st = SliceStats.readSidecar(dir).get
    val again = SliceStats.parseStats(SliceStats.render(st)).get
    st.files.foreach { case (f, fs) =>
      val fs2 = again.files(f)
      assert(fs2.blooms.keySet == fs.blooms.keySet)
      fs.blooms.foreach { case (c, cb) =>
        assert(fs2.blooms(c).ptype == cb.ptype)
        assert(fs2.blooms(c).bitsets.map(_.toSeq) == cb.bitsets.map(_.toSeq))
      }
    }
  }

  test("declaring a bloom column that does not exist is refused") {
    intercept[IllegalArgumentException] {
      new GraftTable(spark,
        new Catalog(java.nio.file.Files.createTempDirectory("graft-bad").toString),
        "bad", StructType(Seq(StructField("id", LongType, nullable = false))),
        bloomCols = Seq("nope"))
    }
  }
}
