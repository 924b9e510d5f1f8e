package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Persistent BM25 inverted index: tokenize-once/search-forever,
  * signed-delta scalar maintenance, bucket-pruned refreshes, and scores
  * identical to a from-scratch recompute. */
class Bm25IndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def text(i: Long): String =
    s"doc $i talks about topic${i % 5} and filler word${i * 13 % 17}" +
      (if (i % 3 == 0) " vector" else "") +
      (if (i % 4 == 0) " vector vector" else "")

  private def srcTable(): GraftTable = {
    val cat = new Catalog(
      java.nio.file.Files.createTempDirectory("graft-bm25idx").toString)
    new GraftTable(spark, cat, "docs", StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true))),
      uniqueKeys = Seq(Seq("doc_id")))
  }

  private def postRows(t: GraftTable): Set[(String, Long, Int, Int)] =
    t.snapshot().select($"term", $"id", $"tf", $"dl")
      .as[(String, Long, Int, Int)].collect().toSet

  private def freshPostings(src: GraftTable): Set[(String, Long, Int, Int)] =
    Bm25Index.postingsOf(src.snapshot(), "text", "doc_id")
      .as[(String, Long, Int, Int)].collect().toSet

  test("build persists postings + scalars; refresh folds signed deltas") {
    val src = srcTable()
    src.createMany((1L to 40L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 8)
    assert(postRows(idx.post) == freshPostings(src))
    val (n0, s0, nb) = idx.stats()
    assert(n0 == 40L && nb == 8)
    assert(s0 == src.snapshot().agg(sum(size(split($"text", " "))))
      .collect()(0).getLong(0), "sum_dl equals the corpus token count")

    // inserts, a text update that drops AND adds terms, a null-text
    // update (dl goes 0, postings vanish), and deletes
    src.createMany((41L to 50L).map(i => (i, text(i))).toDF("doc_id", "text"))
    src.updateMany(graft.query.RawCol($"doc_id" === 7L),
      Map("text" -> lit("completely new words here")))
    src.updateMany(graft.query.RawCol($"doc_id" === 9L),
      Map("text" -> lit(null).cast("string")))
    src.deleteMany(graft.query.RawCol($"doc_id" > 35L && $"doc_id" <= 40L))
    assert(idx.refresh().nonEmpty)
    assert(idx.refresh().isEmpty, "caught up")
    assert(postRows(idx.post) == freshPostings(src),
      "CDF-refreshed postings must equal a from-scratch tokenize")
    val (n1, s1, _) = idx.stats()
    val expect = src.snapshot().agg(count(lit(1)),
      coalesce(sum(size(filter(split(coalesce($"text", lit("")), " "),
        t => t =!= lit(""))).cast("long")), lit(0L))).collect()(0)
    assert(n1 == expect.getLong(0) && s1 == expect.getLong(1),
      "signed scalar fold must equal the from-scratch scalars")
  }

  test("search from a reopened handle matches an inline token-BM25 recompute") {
    val src = srcTable()
    src.createMany((1L to 60L).map(i => (i, text(i))).toDF("doc_id", "text"))
    Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 4)
    val idx = Bm25Index.open(src, "b", "text", "doc_id")
    val got = idx.search(Seq("vector", "filler"))
      .select($"doc_id", $"n_terms", $"bm25")
      .as[(Long, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // inline recompute with the same tokenized tf/df/dl and formula
    val toks = src.snapshot().select($"doc_id",
      filter(split($"text", " "), t => t =!= lit("")).as("w"))
    val rows = toks.select($"doc_id", size($"w").as("dl"),
      size(filter($"w", t => t === "vector")).as("tf0"),
      size(filter($"w", t => t === "filler")).as("tf1"))
      .as[(Long, Int, Int, Int)].collect()
    val n = rows.length.toDouble
    val avgdl = rows.map(_._2.toLong).sum.toDouble / n
    val df0 = rows.count(_._3 > 0).toDouble
    val df1 = rows.count(_._4 > 0).toDouble
    def score(tf: Double, df: Double, dl: Double): Double =
      math.log(1.0 + ((n - df) + 0.5) / (df + 0.5)) *
        ((tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + ((0.75 * dl) / avgdl))))
    rows.filter(r => r._3 > 0 || r._4 > 0).foreach { case (id, dl, t0, t1) =>
      val (nT, s) = got(id)
      assert(nT == (if (t0 > 0) 1 else 0) + (if (t1 > 0) 1 else 0))
      val exp = BigDecimal(score(t0, df0, dl) + score(t1, df1, dl))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(s == exp, s"doc $id: got $s expected $exp")
    }
    assert(got.keySet == rows.filter(r => r._3 > 0 || r._4 > 0)
      .map(_._1).toSet, "only matching docs are returned")
  }

  test("a refresh rewrites only the buckets its delta's terms hash into") {
    val src = srcTable()
    src.createMany((1L to 80L).map(i => (i, s"stable${i} unique${i}"))
      .toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 8)
    val before = src.catalog.manifest()(idx.post.name)
    assert(before.size == 8, s"expected 8 bucket slices, got ${before.size}")
    // a one-doc, one-term delta touches at most one bucket slice
    src.createMany(Seq((1000L, "solo")).toDF("doc_id", "text"))
    assert(idx.refresh().nonEmpty)
    val after = src.catalog.manifest()(idx.post.name)
    val moved = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(moved.size == 1,
      s"a one-term delta must rewrite exactly one bucket slice, moved $moved")
  }

  test("search's bucket predicate prunes the postings scan to one slice") {
    val src = srcTable()
    src.createMany((1L to 80L).map(i => (i, s"stable${i} unique${i}"))
      .toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 8)
    // route the term through Spark's own hash, exactly as search does
    val b = Seq("stable7").toDF("term")
      .select(pmod(xxhash64($"term"), lit(8)).cast("int"))
      .collect()(0).getInt(0)
    val (kept, total) = idx.post.prunedDirs(
      col("bucket") === b && col("term") === "stable7")
    assert(total == 8, s"expected 8 bucket slices, got $total")
    assert(kept.size == 1,
      s"a single term's scan must keep exactly its bucket's slice, kept $kept")
    // and the search result over the pruned read is still correct
    val hit = idx.search(Seq("stable7")).select($"doc_id")
      .as[Long].collect().toSeq
    assert(hit == Seq(7L))
  }

  test("an index built on an empty corpus is fed entirely by refreshes") {
    val src = srcTable()
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 4)
    val (n0, s0, _) = idx.stats()
    assert(n0 == 0L && s0 == 0L, "empty build persists zero scalars")
    src.createMany((1L to 20L).map(i => (i, text(i))).toDF("doc_id", "text"))
    assert(idx.refresh().nonEmpty)
    src.createMany((21L to 30L).map(i => (i, text(i))).toDF("doc_id", "text"))
    assert(idx.refresh().nonEmpty)
    assert(postRows(idx.post) == freshPostings(src),
      "batch-fed postings must equal a from-scratch tokenize")
    assert(idx.stats()._1 == 30L)
  }

  test("a repeated query term scores once — search dedupes at entry") {
    val src = srcTable()
    src.createMany((1L to 60L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 8)
    def rows(terms: Seq[String]) =
      idx.search(terms).select($"doc_id", $"n_terms", $"bm25")
        .as[(Long, Int, Double)].collect().toSet
    assert(rows(Seq("vector", "filler", "vector")) ==
      rows(Seq("vector", "filler")),
      "duplicate terms must not double-count scores or n_terms")
  }

  test("phraseSearch counts consecutive occurrences from the positional postings") {
    val src = srcTable()
    // hand-authored docs with known phrase structure, incl. repeats and
    // overlapping occurrences
    src.createMany(Seq(
      (1L, "big data big data pipeline"),       // "big data" x2
      (2L, "data big"),                          // reversed: 0
      (3L, "big data"),                          // x1
      (4L, "big big big"),                       // "big big" x2 (overlap)
      (5L, "the big data set and big data lake"),// x2
      (6L, "nothing here"),
      (7L, null)).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 4,
      withPositions = true)
    def phrase(ts: String*) =
      idx.phraseSearch(ts).as[(Long, Int)].collect().toMap
    assert(phrase("big", "data") == Map(1L -> 2, 3L -> 1, 5L -> 2))
    assert(phrase("big", "big") == Map(4L -> 2),
      "a repeated-word phrase counts overlapping occurrences")
    assert(phrase("big", "data", "pipeline") == Map(1L -> 1))
    assert(phrase("data", "nothing").isEmpty, "cross-doc terms never match")
    // positions survive a signed-delta refresh (delete + re-add + update)
    src.updateMany(graft.query.RawCol($"doc_id" === 2L),
      Map("text" -> lit("now big data too")))
    src.deleteMany(graft.query.RawCol($"doc_id" === 3L))
    assert(idx.refresh().nonEmpty)
    assert(phrase("big", "data") == Map(1L -> 2, 2L -> 1, 5L -> 2))
    // bounded: topk cut plans as a TakeOrdered heap here too
    val bounded = idx.phraseSearch(Seq("big", "data"), topk = 2)
    assert(bounded.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    assert(bounded.as[(Long, Int)].collect().toMap == Map(1L -> 2, 5L -> 2))
    // a reopened handle recovers the positional flag from the meta row
    val reopened = Bm25Index.open(src, "b", "text", "doc_id")
    assert(reopened.positional)
    assert(reopened.phraseSearch(Seq("big", "data"))
      .as[(Long, Int)].collect().toMap == Map(1L -> 2, 2L -> 1, 5L -> 2))
  }

  test("phraseSearch prunes the postings scan to its terms' buckets") {
    val src = srcTable()
    src.createMany((1L to 80L).map(i => (i, s"alpha$i beta$i"))
      .toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 8,
      withPositions = true)
    val bs = Seq("alpha7", "beta7").toDF("term")
      .select(pmod(xxhash64($"term"), lit(8)).cast("int"))
      .distinct().as[Int].collect().toSeq
    val (kept, total) = idx.post.prunedDirs(
      col("bucket").isin(bs.map(Int.box): _*))
    assert(total == 8 && kept.size == bs.size,
      s"a two-term phrase scan must keep only its terms' buckets, kept $kept")
    assert(idx.phraseSearch(Seq("alpha7", "beta7"))
      .select($"doc_id", $"n_phrase").as[(Long, Int)].collect().toSeq ==
      Seq((7L, 1)))
  }

  test("slopSearch: greedy-chain windows, proximity weights, slop-0 = exact") {
    val src = srcTable()
    src.createMany(Seq(
      (1L, "big data pipeline"),                // exact: disp 0
      (2L, "big fast data pipeline"),           // 1 gap: disp 1
      (3L, "big a b data c pipeline"),          // disp 3
      (4L, "big a b c data pipeline"),          // disp 3
      (5L, "big a b c d data pipeline"),        // disp 4: out at slop 3
      (6L, "data big pipeline"),                // out of order: no match
      (7L, "big data big data pipeline"),       // starts 0 (disp 2) and 2 (disp 0)
      (8L, "big pipeline")                      // missing middle term
    ).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 4,
      withPositions = true)
    def slop(s: Int) =
      idx.slopSearch(Seq("big", "data", "pipeline"), slop = s)
        .as[(Long, Int, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // slop 3: weights are 3 - disp + 1
    assert(slop(3) == Map(
      1L -> ((1, 4)), 2L -> ((1, 3)), 3L -> ((1, 1)), 4L -> ((1, 1)),
      7L -> ((2, 6)))) // disp 2 → 2, disp 0 → 4
    // slop 0 degenerates to exact-phrase counting (prox = n_matches)
    assert(slop(0) == Map(1L -> ((1, 1)), 7L -> ((1, 1))))
    // wider window admits doc 5
    assert(slop(4).contains(5L) && slop(4)(5L) == ((1, 1)))
    // bounded cut: prox desc, id asc, TakeOrdered heap
    val bounded = idx.slopSearch(Seq("big", "data", "pipeline"), slop = 3,
      topk = 2)
    assert(bounded.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    assert(bounded.as[(Long, Int, Long)].collect().map(_._1).toSeq ==
      Seq(7L, 1L))
    // repeated-term phrase chains strictly increasing positions
    assert(idx.slopSearch(Seq("big", "big"), slop = 1)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._2).toMap ==
      Map(7L -> 1)) // positions 0,2: disp 1 fits slop 1
  }

  test("a frequency-only index refuses slop search loudly") {
    val src = srcTable()
    src.createMany(Seq((1L, "big data")).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      idx.slopSearch(Seq("big", "data"), slop = 1)
    }
    assert(e.getMessage.contains("withPositions"))
  }

  test("a frequency-only index refuses phrase search loudly") {
    val src = srcTable()
    src.createMany(Seq((1L, "big data")).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 2)
    assert(!idx.positional && !Bm25Index.open(src, "b", "text", "doc_id").positional)
    val e = intercept[IllegalArgumentException] {
      idx.phraseSearch(Seq("big", "data"))
    }
    assert(e.getMessage.contains("withPositions"))
  }

  test("topk plans a TakeOrdered heap and returns the ranked head") {
    val src = srcTable()
    src.createMany((1L to 60L).map(i => (i, text(i))).toDF("doc_id", "text"))
    val idx = Bm25Index.build(src, "b", "text", "doc_id", nBuckets = 8)
    val bounded = idx.search(Seq("vector", "filler"), topk = 5)
    assert(bounded.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "a bounded search must cut inside the plan, not sort the world")
    val got = bounded.select($"doc_id", $"bm25")
      .as[(Long, Double)].collect().toSeq
    val all = idx.search(Seq("vector", "filler"))
      .select($"doc_id", $"bm25").as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }.take(5).toSeq
    assert(got.sortBy { case (id, s) => (-s, id) } == all,
      "topk must equal the head of the full deterministic order")
  }
}
