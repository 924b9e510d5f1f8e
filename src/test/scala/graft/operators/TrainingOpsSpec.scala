package graft.operators

import graft.SparkTestBase
import graft.functions.TextFunctions
import graft.multimodal.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---------------- text functions ----------------

  test("tokenCount: whitespace and empty-string behavior") {
    val df = Seq(("a b  c", 3), ("  ", 0), ("one", 1), ("a\tb\nc d", 4))
      .toDF("t", "expected")
    val bad = df.filter(TextFunctions.tokenCount($"t") =!= $"expected").count()
    assert(bad == 0)
  }

  test("bpeish token count grows with word length") {
    val r = Seq(("hi there", 0), ("internationalization considerations", 0))
      .toDF("t", "x")
      .select(TextFunctions.bpeishTokenCount($"t").as("n")).as[Int].collect()
    assert(r(0) == 3)        // "hi"→1, "there"→2
    assert(r(1) == 9)        // ceil(20/4) + ceil(14/4) pieces
  }

  test("quality score separates natural text from junk") {
    val natural = "the quick brown fox jumps over the lazy dog and runs to the hills with great joy"
    val junk = "$$$ 111 !!! ### 222 %%% 333 @@@ 444 ^^^"
    val r = Seq(natural, junk).toDF("t")
      .select(TextFunctions.qualityScore($"t").as("q")).as[Double].collect()
    assert(r(0) > 0.8 && r(1) < 0.6 && r(0) > r(1))
  }

  test("langId identifies real-language samples and CJK") {
    val samples = Seq(
      ("the cat sat on the mat and looked at the dog", "en"),
      ("le chat est dans la maison et les enfants sont dans le jardin pour une heure", "fr"),
      ("der hund ist nicht in das haus und die katze ist mit dem kind", "de"),
      ("el perro y el gato las casas para los amigos es una historia del pueblo", "es"),
      ("这是一个中文句子", "zh"))
    val df = samples.toDF("t", "expected")
    val wrong = df.filter(TextFunctions.langId($"t") =!= $"expected").collect()
    assert(wrong.isEmpty, s"misidentified: ${wrong.mkString(",")}")
  }

  test("fingerprint is formatting-invariant, rolling fingerprints shift-stable") {
    val df = Seq(
      ("The  quick   brown FOX!", "the quick brown fox"),
      ("a b c d e f g", "a b c d e f g")).toDF("x", "y")
    val neq = df.filter(TextFunctions.fingerprint($"x") =!= TextFunctions.fingerprint($"y")).count()
    assert(neq == 0)
    // a shared 5-token window ⇒ shared rolling fingerprint
    val r = Seq(("alpha beta gamma delta epsilon zeta", "PREFIX alpha beta gamma delta epsilon"))
      .toDF("a", "b")
      .select(size(array_intersect(
        TextFunctions.rollingFingerprints($"a", 5),
        TextFunctions.rollingFingerprints($"b", 5))).as("shared")).as[Int].head()
    assert(r >= 1)
  }

  test("widthBucket matches the reference histogram shape (0-10s, 10 buckets)") {
    val df = Seq(-1.0, 0.0, 500.0, 9999.0, 10000.0, 50000.0).toDF("ms")
    val r = df.select(TextFunctions.widthBucket($"ms", 0, 10000, 10).as("b")).as[Int].collect()
    assert(r.toSeq == Seq(0, 1, 1, 10, 11, 11))
  }

  // ---------------- dedup ----------------

  val docs: Seq[(Long, String)] = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "THE QUICK brown fox   jumps over the lazy dog near the river bank today!"), // normalized dup of 1
    (4L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup (1 token)
    (5L, "completely different content about spark query engines and columnar formats"),
    (6L, "another unrelated document mentioning distributed joins and shuffle services"))

  lazy val docsDf: DataFrame = docs.toDF("doc_id", "text")

  test("exact dedup keeps smallest id per normalized-duplicate group") {
    val survivors = Dedup.exact(docsDf, "text", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L, 5L, 6L))
    val groups = Dedup.exactGroups(docsDf, "text", "doc_id").collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("n") == 3L)
  }

  test("minhash LSH finds the near-dup pair and dedups it") {
    val pairs = Dedup.minhashLshPairs(docsDf, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 1-2-3 are exact/normalized dups (jaccard 1.0); 4 is near 1/2/3
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(pairs.exists(p => p._1 <= 4L && p._2 == 4L || p._1 == 4L))
    assert(!pairs.exists(p => p._2 == 5L || p._2 == 6L))
    val survivors = Dedup.minhashDedup(docsDf, "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 5L, 6L))
  }

  test("dedupLinesWithinDoc keeps first occurrences in order") {
    val doc = "nav home about\nreal content line one\nnav home about\n" +
      "real content line two\nnav home about\nreal content line one"
    val r = Dedup.dedupLinesWithinDoc(Seq((1L, doc)).toDF("id", "text"), "text")
      .select($"n_lines", $"n_unique", $"text_dedup")
      .as[(Long, Long, String)].head()
    assert(r._1 == 6L && r._2 == 3L)
    assert(r._3 == "nav home about\nreal content line one\nreal content line two")
  }

  test("dedupLinesWithinDoc: over-maxLines docs pass through flagged, bounded") {
    // 50k distinct lines: unguarded first-occurrence probing is ~2.5e9
    // string comparisons (minutes); the guard must make this instant
    val monster = (0 until 50000).map(i => s"line $i").mkString("\n")
    val small = "a\nb\na"
    val df = Seq((1L, monster), (2L, small)).toDF("id", "text")
    val t0 = System.nanoTime()
    val rows = Dedup.dedupLinesWithinDoc(df, "text", maxLines = 1000)
      .select($"id", $"n_lines", $"n_unique", $"text_dedup", $"line_dedup_skipped")
      .collect().map(r => r.getLong(0) -> r).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"guard did not bound the quadratic probe: ${secs}s")
    val m = rows(1L)
    assert(m.getBoolean(4) && m.getLong(1) == 50000L && m.isNullAt(2))
    assert(m.getString(3) == monster, "skipped doc must pass through unmodified")
    val s2 = rows(2L)
    assert(!s2.getBoolean(4) && s2.getLong(2) == 2L && s2.getString(3) == "a\nb")
  }

  test("unigramCrossEntropy: reference-like docs score lower than unseen vocabulary") {
    val corpus = Seq(
      (1L, "the cat sat on the mat near the door", true),
      (2L, "the dog sat on the mat near the cat", true),
      (3L, "the cat and the dog sat near the mat", false),   // ref vocabulary
      (4L, "zyx wvu tsr qpo nml kji hgf edc baz", false))    // unseen words
      .toDF("doc_id", "text", "is_ref")
    val ce = Importance.unigramCrossEntropy(corpus, "doc_id", "text",
        isRef = $"is_ref", buckets = 512)
      .select($"doc_id", $"ce").as[(Long, Double)].collect().toMap
    assert(ce(3L) < ce(4L),
      s"reference-vocabulary doc must score lower ce: ${ce(3L)} vs ${ce(4L)}")
    // unseen-vocab ce is exactly the add-one floor: every token hits a
    // zero-count bucket (modulo rare hash collisions into ref buckets)
    assert(ce(4L) > ce(1L) && ce(4L) > ce(2L))
  }

  test("portable md5 minhash family agrees with the xxhash64 production path") {
    // The exact-dup pairs (jaccard 1.0, every band collides regardless of
    // hash family) must be identical, with identical verified jaccard; the
    // probabilistic sub-1.0 candidates may differ per family but every
    // surviving pair's jaccard is exact set arithmetic, so any pair BOTH
    // families surface must agree on the value.
    val prod = Dedup.minhashLshPairs(docsDf, "text", "doc_id", threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val port = Dedup.minhashLshPairsPortable(docsDf, "text", "doc_id", threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    for (p <- Seq((1L, 2L), (1L, 3L), (2L, 3L))) {
      assert(prod.get(p).contains(1.0), s"production family must find exact dup $p")
      assert(port.get(p).contains(1.0), s"portable family must find exact dup $p")
    }
    for ((p, j) <- port)
      assert(prod.get(p).forall(_ == j), s"family-independent jaccard differs at $p")
    assert(!port.keys.exists(p => p._2 == 5L || p._2 == 6L),
      "portable family must not pair unrelated docs")
  }

  test("simhash: identical docs distance 0, near-dups small hamming, unrelated far") {
    val sigs = docsDf.select($"doc_id", Dedup.simhash($"text").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L) && sigs(1L) == sigs(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(4L)) <= 12)
    assert(ham(sigs(1L), sigs(5L)) > 12)
    val pairs = Dedup.simhashPairs(docsDf, "text", "doc_id", maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 5L && p._1 == 1L))
  }

  test("dupClusters collapses transitive chains to the smallest id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (9L, 10L))
      .toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(5L) == 5L && clusters(6L) == 5L && clusters(7L) == 5L)
    assert(clusters(9L) == 9L && clusters(10L) == 9L)
  }

  test("dupClusters adversarial: 24-node chain and 200-node star converge within the iteration bound") {
    // chain 0-1-2-...-24: worst-case diameter for min-label propagation
    // (labels flow one hop per round from node 0, so the chain needs ~24
    // rounds — far past the old default bound of 10); star: hub 1000 with
    // 200 leaves, converges in 2 rounds but stresses per-round join width
    val chain = (0L until 24L).map(i => (i, i + 1))
    val star = (1L to 200L).map(i => (1000L, 1000L + i))
    val pairs = (chain ++ star).toDF("id_a", "id_b")
    // smallGraphEdges = 0 forces the DISTRIBUTED loop (the driver
    // union-find would otherwise absorb a graph this small)
    val clusters = Dedup.dupClustersManaged(pairs, maxIters = 50,
        checkpointEvery = 4, smallGraphEdges = 0)
      .df.as[(Long, Long)].collect().toMap
    assert((0L to 24L).forall(clusters(_) == 0L))
    assert(clusters(1000L) == 1000L)
    assert((1L to 200L).forall(i => clusters(1000L + i) == 1000L))
  }

  test("driver union-find and distributed loop agree on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val fast = Dedup.dupClusters(pairs) // small → driver path
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.dupClustersManaged(pairs, smallGraphEdges = 0)
      .df.as[(Long, Long)].collect().toMap
    assert(fast == dist)
  }

  test("minhashDedupClusters keeps one survivor per transitive near-dup cluster") {
    // 1~2, 2~3 (all mutual dups here), plus unrelated 5,6
    val survivors = Dedup.minhashDedupClusters(docsDf, "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 5L, 6L))
  }

  test("incremental minhash: new batch deduped against prebuilt index without re-sketching corpus") {
    val corpus = docsDf.filter($"doc_id" <= 2) // docs 1,2 (dups of each other)
    val index = Dedup.minhashIndex(corpus, "text", "doc_id")
    val newBatch = Seq(
      (10L, docs.find(_._1 == 1L).get._2),   // dup of corpus doc 1
      (11L, "a genuinely novel document about stream processing watermarks and state stores"),
      (12L, "a genuinely novel document about stream processing watermarks and state stores") // in-batch dup
    ).toDF("doc_id", "text")
    val dups = Dedup.minhashIncremental(index, newBatch, "text", "doc_id", threshold = 0.7)
      .select("new_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(dups.contains((10L, 1L)) || dups.contains((10L, 2L))) // vs corpus
    assert(dups.contains((12L, 11L)))                            // within batch
    assert(!dups.exists(_._1 == 11L))                            // novel survives
  }

  test("ngram jaccard verification on explicit pairs") {
    val pairs = Seq((1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val r = Dedup.ngramJaccard(docsDf, pairs, "text", "doc_id")
      .orderBy("id_b").select("jaccard").as[Double].collect()
    assert(r(0) > 0.5 && r(1) < 0.1)
  }

  test("embedding near-dup: duplicate vectors found, orthogonal not") {
    val emb = Seq(
      (1L, Array(1.0f, 0f, 0f, 0f)), (2L, Array(0.99f, 0.01f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)), (4L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, "embedding", "vec_id",
      dim = 4, threshold = 0.95, numPlanes = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  // ---------------- similarity search ----------------

  test("brute-force topK: self is rank 1 with cosine 1.0, ranks contiguous") {
    val corpus = Tables()
    val queries = corpus.filter($"vec_id".isin(0L, 7L))
      .select($"vec_id".as("qid"), $"embedding")
    val r = Similarity.bruteForceTopK(corpus, queries, "embedding", "vec_id", "qid", k = 5)
    val rows = r.collect()
    assert(rows.length == 10)
    val self = rows.filter(x => x.getAs[Long]("qid") == x.getAs[Long]("id"))
    assert(self.length == 2 && self.forall(_.getAs[Int]("rank") == 1))
    assert(self.forall(_.getAs[Double]("cosine") > 0.9999))
  }

  test("LSH topK: high recall on clustered embeddings, bounded output on real corpus") {
    // clustered corpus: 25 centers × 20 members, members = center + noise —
    // the regime ANN exists for (uniform random vectors have no neighbors
    // to find; hyperplane buckets can't beat chance there)
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(25)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for (c <- centers.indices; m <- 0 until 20) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      ((c * 20 + m).toLong, v)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val queries = clustered.filter($"vec_id" % 20 === 0 && $"vec_id" < 100)
      .select($"vec_id".as("qid"), $"embedding")
    val exact = Similarity.bruteForceTopK(clustered, queries, "embedding", "vec_id", "qid", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(clustered, queries, "embedding", "vec_id", "qid",
      dim = 16, k = 5, numPlanes = 10, maxHammingProbe = 1)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall too low")
    // smoke on the real corpus: runs, respects k
    val corpus = Tables()
    val q2 = corpus.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding")
    val r2 = Similarity.lshTopK(corpus, q2, "embedding", "vec_id", "qid",
      dim = 64, k = 5, numPlanes = 8, maxHammingProbe = 1)
    assert(r2.groupBy("qid").count().agg(max("count")).as[Long].head() <= 5)
  }

  test("bloom decontamination == exact decontamination (FPs die in the verify join)") {
    val docs = graft.Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val bench = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val exact = Dedup.decontaminationHits(corpus, bench, "text", "doc_id", n = 6)
      .as[(Long, Long)].collect().toSet
    // an aggressive FPP still yields identical output — the sketch only
    // routes data, it never decides membership
    val bloom = Dedup.decontaminationHitsBloom(corpus, bench, "text", "doc_id",
      n = 6, fpp = 0.2)
      .as[(Long, Long)].collect().toSet
    assert(bloom == exact, s"bloom ${bloom.size} vs exact ${exact.size}")
  }

  test("sourceOverlap: exact jaccard on constructed sets, complete matrix") {
    // srcA grams {g0..g9}, srcB {g5..g14} (overlap 5/15), srcC disjoint
    val rows =
      (0 until 10).map(i => ("A", s"g$i")) ++
      (5 until 15).map(i => ("B", s"g$i")) ++
      (100 until 105).map(i => ("C", s"g$i")) ++
      Seq(("A", "g0"), ("B", "g5")) // duplicates must not inflate sets
    val grams = rows.toDF("source", "gram")
    val m = graft.operators.CorpusAudit.sourceOverlap(grams, "source", "gram")
      .orderBy("src_a", "src_b")
      .collect()
    assert(m.length == 3, "3 pairs for 3 sources (complete matrix)")
    val ab = m.find(r => r.getString(0) == "A" && r.getString(1) == "B").get
    assert(ab.getAs[Long]("inter") == 5 &&
      ab.getAs[Double]("jaccard") == 0.333333) // 5/15 rounded to 6 decimals
    val ac = m.find(r => r.getString(0) == "A" && r.getString(1) == "C").get
    assert(ac.getAs[Long]("inter") == 0 && ac.getAs[Double]("jaccard") == 0.0)
  }

  test("DSIR: target-slice documents outscore the background on average") {
    // Two dialects: target docs share a vocabulary ("alpha beta ..."),
    // background docs another — the LM ratio must separate them.
    val rnd = new scala.util.Random(7)
    val tgtWords = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val bgWords = Array("zeta", "eta", "theta", "iota", "kappa")
    def sentence(ws: Array[String]): String =
      Array.fill(12)(ws(rnd.nextInt(ws.length))).mkString(" ")
    val rows = (0 until 200).map { i =>
      val isTgt = i % 2 == 0
      (i.toLong, sentence(if (isTgt) tgtWords else bgWords), isTgt)
    }
    val df = rows.toDF("doc_id", "text", "is_tgt")
    val w = graft.operators.Importance.dsirWeights(df, "doc_id", "text",
      isTarget = col("is_tgt"), buckets = 256)
    val joined = w.join(df.select("doc_id", "is_tgt"), "doc_id")
    val avgT = joined.filter(col("is_tgt")).agg(avg("dsir")).as[Double].head()
    val avgB = joined.filter(!col("is_tgt")).agg(avg("dsir")).as[Double].head()
    assert(avgT > avgB + 0.5, s"target $avgT vs background $avgB")
    // short docs (<2 tokens) carry no bigram and are excluded, not scored
    val tiny = Seq((1L, "word", true)).toDF("doc_id", "text", "is_tgt")
    assert(graft.operators.Importance.dsirWeights(tiny, "doc_id", "text",
      col("is_tgt")).count() == 0)
  }

  test("LSH topK: probe radius 2 recalls at least as much as radius 1") {
    // Regression: maxHammingProbe > 1 used to silently degrade to 1 —
    // the radius the API promised bought nothing. The probe set is a
    // SUPERSET per radius, so recall must be monotone in it.
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(25)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for (c <- centers.indices; m <- 0 until 20) yield {
      val v = centers(c).map(x => (x + rnd.nextGaussian() * 0.15).toFloat)
      ((c * 20 + m).toLong, v)
    }
    val clustered = rows.toDF("vec_id", "embedding")
    val queries = clustered.filter($"vec_id" % 20 === 0 && $"vec_id" < 200)
      .select($"vec_id".as("qid"), $"embedding")
    val exact = Similarity.bruteForceTopK(clustered, queries,
        "embedding", "vec_id", "qid", k = 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    def recallAt(r: Int): Double = {
      val got = Similarity.lshTopK(clustered, queries, "embedding", "vec_id",
          "qid", dim = 16, k = 5, numPlanes = 10, maxHammingProbe = r)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val (r1, r2) = (recallAt(1), recallAt(2))
    assert(r2 >= r1, s"radius-2 recall $r2 below radius-1 $r1")
    // and an out-of-range radius is rejected, not silently capped
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(clustered, queries, "embedding", "vec_id", "qid",
        dim = 16, k = 5, numPlanes = 10, maxHammingProbe = 11)
    }
  }

  private def Tables(): DataFrame = graft.Tables.embeddings(spark, sfDir)

  // ---------------- multimodal ----------------

  test("multimodal: stub decode produces stable features, null payload -> null") {
    val media = Multimodal.synthetic(spark, 100)
    val dec = new Multimodal.DeterministicStubDecoder(16)
    val out = Multimodal.withFeatures(media, dec)
    assert(out.schema("features").dataType.typeName == "array")
    val n = out.count()
    assert(n == 100)
    val nulls = out.filter($"payload".isNull).count()
    assert(nulls > 0 && out.filter($"payload".isNull && $"features".isNotNull).count() == 0)
    val withF = out.filter($"features".isNotNull)
    assert(withF.filter(size($"features") === 16).count() == withF.count())
    // determinism: same pipeline twice → identical features
    val out2 = Multimodal.withFeatures(media, dec)
    assert(out.select("media_id", "features").exceptAll(
      out2.select("media_id", "features")).count() == 0)
  }

  test("multimodal: BMP kernel round-trips through real bytes; corrupt -> all(-1)") {
    import graft.multimodal.{MediaExpressions, MediaKernels}
    // kernel level: build a 5x3 image, parse it back, check a hand-derived pixel
    val bytes = MediaKernels.bmpSynth(7L, 5, 3)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    val p = MediaKernels.bmpParse(bytes)
    assert(p.getLong(0) == 5 && p.getLong(1) == 3 && p.getLong(2) == 24)
    assert(p.getLong(3) == bytes.length && p.getLong(4) == bytes.length)
    // sum_b = Σ (7x + 13y + 7) % 256 over x<5, y<3
    val expB = (for (x <- 0 until 5; y <- 0 until 3) yield (x * 7 + y * 13 + 7) % 256).sum
    assert(p.getLong(5) == expB)
    // corrupt payloads degrade to all(-1), never throw
    assert(MediaKernels.bmpParse("nope".getBytes).getLong(0) == -1L)
    assert(MediaKernels.bmpParse(bytes.take(20)).getLong(0) == -1L)
    // ADVERSARIAL headers: negative pixel offset, int-overflowing width,
    // and a huge height must all fail cleanly (long-arithmetic bounds),
    // never index out of bounds inside a codegen'd expression
    def withLE32(b: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      c(off) = (v & 0xff).toByte; c(off + 1) = ((v >> 8) & 0xff).toByte
      c(off + 2) = ((v >> 16) & 0xff).toByte; c(off + 3) = ((v >> 24) & 0xff).toByte
      c
    }
    assert(MediaKernels.bmpParse(withLE32(bytes, 10, 0x80000000)).getLong(0) == -1L)
    assert(MediaKernels.bmpParse(withLE32(bytes, 18, 0x7FFFFFFF)).getLong(0) == -1L)
    assert(MediaKernels.bmpParse(withLE32(bytes, 22, 0x40000000)).getLong(0) == -1L)
    // expression level, inside a plan
    val out = spark.range(1, 4).select(
      MediaExpressions.bmpParse(MediaExpressions.bmpSynth(
        $"id", lit(4).cast("int"), lit(2).cast("int"))).as("p"))
      .select(element_at($"p", 1)).as[Long].collect()
    assert(out.toSeq == Seq(4L, 4L, 4L))
  }

  test("multimodal: PNG round-trips through deflate + all five filters; corrupt fails closed") {
    import graft.multimodal.{MediaExpressions, MediaKernels, Multimodal}
    // height 7 ≥ 5 → every filter type (row % 5) appears at least once
    val png = MediaKernels.pngSynth(7L, 5, 7)
    val bmp = MediaKernels.bmpSynth(7L, 5, 7)
    val pp = MediaKernels.pngParse(png)
    val bp = MediaKernels.bmpParse(bmp)
    assert(pp.getLong(0) == 5 && pp.getLong(1) == 7)
    assert(pp.getLong(2) == 8 && pp.getLong(3) == 2)
    // CROSS-CODEC parity: same pixel formulas → identical channel sums
    // (bmpParse returns [.., sum_b, sum_g, sum_r]; pngParse [.., r, g, b])
    assert(pp.getLong(4) == bp.getLong(7), "sum_r must match the BMP twin")
    assert(pp.getLong(5) == bp.getLong(6), "sum_g must match the BMP twin")
    assert(pp.getLong(6) == bp.getLong(5), "sum_b must match the BMP twin")
    // and the two MediaDecoder impls agree feature-for-feature
    val fPng = new Multimodal.PngPixelDecoder().decode(png).toSeq
    val fBmp = new Multimodal.BmpPixelDecoder().decode(bmp).toSeq
    assert(fPng == fBmp)
    // multi-IDAT really happened (stream split at 64-byte chunks)
    val idatCount = png.sliding(4).count(_.sameElements("IDAT".getBytes))
    assert(idatCount >= 2, s"expected split IDATs, got $idatCount")
    // corrupt payloads fail closed, never throw: garbage, truncation,
    // a flipped CRC byte, and a flipped DEFLATE byte
    assert(MediaKernels.pngParse("nope".getBytes).getLong(0) == -1L)
    assert(MediaKernels.pngParse(png.take(30)).getLong(0) == -1L)
    val badCrc = png.clone(); badCrc(badCrc.length - 1) = 0x55
    assert(MediaKernels.pngParse(badCrc).getLong(0) == -1L)
    assert(MediaKernels.pngParse(null).getLong(0) == -1L)
    // 1x1 edge (single pixel, filter None only) round-trips too
    assert(MediaKernels.pngParse(MediaKernels.pngSynth(3L, 1, 1)).getLong(0) == 1L)
    // expression level, inside a plan
    val out = spark.range(1, 4).select(
      MediaExpressions.pngParse(MediaExpressions.pngSynth(
        $"id", lit(4).cast("int"), lit(6).cast("int"))).as("p"))
      .select(element_at($"p", 1)).as[Long].collect()
    assert(out.toSeq == Seq(4L, 4L, 4L))
  }

  test("multimodal: GIF round-trips through variable-width LZW; corrupt fails closed") {
    import graft.multimodal.{MediaExpressions, MediaKernels, Multimodal}
    val gif = MediaKernels.gifSynth(7L, 5, 6)
    val p = MediaKernels.gifParse(gif)
    assert(p.getLong(0) == 5 && p.getLong(1) == 6)
    assert(p.getLong(2) == 256 && p.getLong(3) == 8)
    // sums replay the symbolic model: palette[idx(x,y)] summed over pixels
    def idx(x: Int, y: Int) = ((x * 7L + y * 13L + 7L) % 256).toInt
    val px = for (y <- 0 until 6; x <- 0 until 5) yield idx(x, y)
    assert(p.getLong(4) == px.map(i => (i * 5L + 7L * 3L) % 239).sum)
    assert(p.getLong(5) == px.map(i => (i * 11L + 7L * 5L) % 251).sum)
    assert(p.getLong(6) == px.map(i => (i * 7L + 7L) % 256).sum)
    // a LARGE image forces code-width growth past 9/10/11 bits and a
    // mid-stream dictionary behavior a tiny image never reaches
    val big = MediaKernels.gifSynth(3L, 300, 200)
    val bp = MediaKernels.gifParse(big)
    assert(bp.getLong(0) == 300 && bp.getLong(1) == 200)
    val bigPx = for (y <- 0 until 200; x <- 0 until 300)
      yield ((x * 7L + y * 13L + 3L) % 256).toInt
    assert(bp.getLong(4) == bigPx.map(i => (i * 5L + 3L * 3L) % 239).sum,
      "width-growth path must reconstruct every index exactly")
    // the GifPixelDecoder behind the MediaDecoder boundary agrees
    val f = new Multimodal.GifPixelDecoder().decode(gif)
    assert(math.abs(f(0) - p.getLong(4) / (255.0f * 30)) < 1e-6)
    // corrupt payloads fail closed, never throw
    assert(MediaKernels.gifParse("nope".getBytes).getLong(0) == -1L)
    assert(MediaKernels.gifParse(gif.take(40)).getLong(0) == -1L)
    assert(MediaKernels.gifParse(null).getLong(0) == -1L)
    val badLzw = gif.clone(); badLzw(gif.length - 3) = 0x7f
    assert(MediaKernels.gifParse(badLzw).getLong(0) == -1L ||
      MediaKernels.gifParse(badLzw).getLong(4) != p.getLong(4),
      "a flipped LZW byte must fail closed or change the sums")
    // 1x1 edge (single literal + EOI) round-trips
    assert(MediaKernels.gifParse(MediaKernels.gifSynth(3L, 1, 1)).getLong(0) == 1L)
    // expression level, inside a plan
    val out = spark.range(1, 4).select(
      MediaExpressions.gifParse(MediaExpressions.gifSynth(
        $"id", lit(4).cast("int"), lit(6).cast("int"))).as("p"))
      .select(element_at($"p", 1)).as[Long].collect()
    assert(out.toSeq == Seq(4L, 4L, 4L))
  }

  test("multimodal: baseline JPEG round-trips block-constant planes exactly; " +
       "the AC path reconstructs a gradient within quantization error") {
    import graft.multimodal.{MediaExpressions, MediaKernels, Multimodal}
    // exact contract: constant 8x8 blocks + DC quant step 8 survive the
    // full real pipeline (Huffman, zigzag, quant, IDCT) bit-exactly
    val id = 11L; val w = 36; val h = 35 // non-multiple-of-8/16: edge MCUs
    val jpg = MediaKernels.jpegSynth(id, w, h)
    val p = MediaKernels.jpegParse(jpg)
    assert(p.getLong(0) == w && p.getLong(1) == h)
    assert(p.getLong(2) == 3 && p.getLong(3) == id % 3 + 1)
    def planeSum(g: Int, a: Long, b: Long, c: Long): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield ((x / g) * a + (y / g) * b + id * c) % 256).sum
    assert(p.getLong(4) == planeSum(8, 5, 17, 3), "sum_y exact")
    // chroma is constant per 16x16 MACROBLOCK: the 4:2:0 downsample and
    // the coverage-counted upsample-sum are both exact on it
    assert(p.getLong(5) == planeSum(16, 11, 3, 5), "sum_cb exact under 4:2:0")
    assert(p.getLong(6) == planeSum(16, 7, 13, 1), "sum_cr exact under 4:2:0")
    // the stream really declares 2x2 luma sampling
    assert(jpg.sliding(2).exists(s2 =>
      (s2(0) & 0xff) == 0x01 && (s2(1) & 0xff) == 0x22),
      "SOF must declare 4:2:0")
    // restart intervals really fire: 36x35 under 4:2:0 -> 3x3 = 9 MCUs
    assert(jpg.sliding(2).count(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) >= 0xd0 && (s(1) & 0xff) <= 0xd7) >= 1,
      "RSTn markers must appear in the entropy stream")
    // general AC path: a full forward-DCT encode of a smooth gradient
    // decodes within quantization error (per-pixel mean |err| bounded)
    val gw = 32; val gh = 24
    def grad(k: Int) = Array.tabulate(gw * gh)(i =>
      ((i % gw) * 2 + (i / gw) * 3 + k * 20) % 200 + 20)
    val (gy, gcb, gcr) = (grad(0), grad(1), grad(2))
    for (sub <- Seq(false, true)) {
      val gp = MediaKernels.jpegParse(MediaKernels.jpegEncode(
        gy, gcb, gcr, gw, gh, restartInterval = 0, subsample420 = sub))
      assert(gp.getLong(0) == gw && gp.getLong(3) == 0)
      // chroma under 4:2:0 additionally pays the 2x2 averaging error
      val tol = Seq(4L, if (sub) 8L else 4L, if (sub) 8L else 4L)
      Seq(gy, gcb, gcr).zipWithIndex.foreach { case (plane, ci) =>
        val got = gp.getLong(4 + ci)
        val want = plane.map(_.toLong).sum
        assert(math.abs(got - want) <= tol(ci) * gw * gh,
          s"AC reconstruction drift (sub=$sub, c=$ci): got $got want $want")
      }
    }
    // the decoder boundary twin
    val f = new Multimodal.JpegPixelDecoder().decode(jpg)
    assert(math.abs(f(0) - p.getLong(4) / (255.0f * w * h)) < 1e-6)
    // corrupt payloads fail closed, never throw: garbage, truncation,
    // a progressive SOF, a flipped entropy byte
    assert(MediaKernels.jpegParse("nope".getBytes).getLong(0) == -1L)
    assert(MediaKernels.jpegParse(jpg.take(60)).getLong(0) == -1L)
    assert(MediaKernels.jpegParse(null).getLong(0) == -1L)
    val prog = jpg.clone()
    // SOF0 marker byte 0xc0 -> 0xc2: the file now claims progressive but
    // carries a baseline scan header (Ss=0, Se=63), which violates the
    // progressive scan algebra (a DC scan must have Se=0) -> fail closed
    val sof = jpg.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc0)
    prog(sof + 1) = 0xc2.toByte
    assert(MediaKernels.jpegParse(prog).getLong(0) == -1L,
      "a baseline scan inside a SOF2 file is malformed -> fail closed")
    // 1x1 edge and expression level inside a plan
    assert(MediaKernels.jpegParse(MediaKernels.jpegSynth(3L, 1, 1)).getLong(0) == 1L)
    val out = spark.range(1, 4).select(
      MediaExpressions.jpegParse(MediaExpressions.jpegSynth(
        $"id", lit(9).cast("int"), lit(10).cast("int"))).as("p"))
      .select(element_at($"p", 1)).as[Long].collect()
    assert(out.toSeq == Seq(9L, 9L, 9L))
  }

  test("multimodal: pngSynth survives a multi-MB payload (deflate bound)") {
    import graft.multimodal.MediaKernels
    // ~4.2 MB of filtered scanlines — past the point where stored-block
    // overhead (~5 bytes / 16383) exceeds a fixed 1 KiB slack, so the
    // output buffer must be sized by the real deflate worst-case bound
    val big = MediaKernels.pngSynth(13L, 1400, 1000)
    val p = MediaKernels.pngParse(big)
    assert(p.getLong(0) == 1400 && p.getLong(1) == 1000)
  }

  test("multimodal: WAV chunk walk parses around junk chunks; PCM decode is exact") {
    import graft.multimodal.MediaKernels
    val bytes = MediaKernels.wavSynth(11L, 2, 8000, 50)
    val p = MediaKernels.wavParse(bytes)
    assert(p.getLong(0) == 2 && p.getLong(1) == 8000 && p.getLong(2) == 16)
    assert(p.getLong(3) == 8000 * 2 * 2 && p.getLong(4) == 4)
    assert(p.getLong(5) == 50 * 2 * 2)
    assert(p.getLong(6) == 50L * 2 * 2 * 1000 / (8000 * 2 * 2))
    val expAbs = (for (i <- 0 until 50; c <- 0 until 2)
      yield math.abs((i * 31 + c * 17 + 11) % 4001 - 2000)).sum
    assert(p.getLong(7) == expAbs)
    assert(MediaKernels.wavParse(bytes.take(30)).getLong(0) == -1L)
    // adversarial chunk size near u32 max: int arithmetic would overflow
    // the bound check negative and walk out of the array — must fail -1
    val evil = bytes.clone()
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte // fmt size = 0x7fffffff
    assert(MediaKernels.wavParse(evil).getLong(0) == -1L)
  }

  test("multimodal: dHash is noise-tolerant, id-discriminating, and Hamming-band paired") {
    import graft.multimodal.{MediaExpressions, MediaKernels}
    def dhash(b: Array[Byte]): (Long, Long) = {
      val a = MediaKernels.bmpDhash(b); (a.getLong(0), a.getLong(1))
    }
    val img = MediaKernels.bmpSynth(42L, 20, 16)
    val (ok, h) = dhash(img)
    assert(ok == 1L)
    // identity: same bytes, same hash
    assert(dhash(MediaKernels.bmpSynth(42L, 20, 16)) == ((1L, h)))
    // ±1-pixel noise flips AT MOST one bit (the perturbed cell sits in
    // exactly one adjacent-mean comparison)
    val (okP, hP) = dhash(MediaKernels.bmpPerturb(img))
    assert(okP == 1L && java.lang.Long.bitCount(h ^ hP) <= 1)
    // a different image is far (deterministic fixture, > band threshold)
    val (_, hOther) = dhash(MediaKernels.bmpSynth(707L, 20, 16))
    assert(java.lang.Long.bitCount(h ^ hOther) > 3,
      s"unrelated images must not collide: ${java.lang.Long.bitCount(h ^ hOther)}")
    // degenerate dims leave grid cells empty: bit 0, never a crash
    assert(dhash(MediaKernels.bmpSynth(1L, 4, 3))._1 == 1L)
    // corrupt payloads: ok=0, perturb passes bytes through unchanged
    assert(dhash("junk".getBytes)._1 == 0L)
    assert(MediaKernels.bmpPerturb("junk".getBytes).toSeq == "junk".getBytes.toSeq)

    // operator composition: planted twins surface through the SAME
    // Hamming band join SimHash uses; unrelated images do not pair
    val imgs = spark.range(0, 40).select($"id".as("img"),
      MediaExpressions.bmpSynth($"id", lit(20).cast("int"), lit(16).cast("int")).as("p"))
      .unionByName(spark.range(0, 40).select(($"id" + 1000L).as("img"),
        MediaExpressions.bmpPerturb(MediaExpressions.bmpSynth(
          $"id", lit(20).cast("int"), lit(16).cast("int"))).as("p")))
    val hashed = imgs.select($"img",
      element_at(MediaExpressions.bmpDhash($"p"), 2).as("h64"))
    val pairs = Dedup.hamming64Pairs(hashed, "h64", "img",
      maxHamming = 1, maxBucket = 1 << 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 40L).foreach(i =>
      assert(pairs.contains((i, i + 1000L)), s"twin pair $i missing"))
  }

  test("multimodal: audio energy fingerprint is noise-tolerant and Hamming-band paired") {
    import graft.multimodal.{MediaExpressions, MediaKernels}
    def efp(b: Array[Byte]): (Long, Long) = {
      val a = MediaKernels.wavEfp(b); (a.getLong(0), a.getLong(1))
    }
    val clip = MediaKernels.wavSynth(42L, 2, 8000, 150)
    val (ok, h) = efp(clip)
    assert(ok == 1L)
    // identity: same bytes, same fingerprint
    assert(efp(MediaKernels.wavSynth(42L, 2, 8000, 150)) == ((1L, h)))
    // ±1-sample noise flips AT MOST one bit (frame 0 sits only in the
    // bin-0-vs-bin-1 comparison)
    val perturbed = MediaKernels.wavPerturb(clip)
    assert(!perturbed.sameElements(clip), "perturb must change the payload")
    val (okP, hP) = efp(perturbed)
    assert(okP == 1L && java.lang.Long.bitCount(h ^ hP) <= 1)
    // a different clip is far (deterministic fixture, > band threshold)
    val (_, hOther) = efp(MediaKernels.wavSynth(707L, 2, 8000, 150))
    assert(java.lang.Long.bitCount(h ^ hOther) > 3,
      s"unrelated clips must not collide: ${java.lang.Long.bitCount(h ^ hOther)}")
    // int16 wrap cases move |s| by exactly 1, never more: perturb a clip
    // whose first sample is forced to the extremes via raw byte surgery
    // is covered by the kernel contract test below on short clips
    assert(efp(MediaKernels.wavSynth(1L, 1, 8000, 30))._1 == 1L) // < 65 frames: empty bins, no crash
    // corrupt payloads: ok=0, perturb passes bytes through unchanged
    assert(efp("junk".getBytes)._1 == 0L)
    assert(MediaKernels.wavPerturb("junk".getBytes).toSeq == "junk".getBytes.toSeq)

    // operator composition: planted twins surface through the SAME
    // Hamming band join the image/text sketches use
    val clips = spark.range(0, 40).select($"id".as("clip"),
      MediaExpressions.wavSynth($"id", lit(2).cast("int"),
        lit(8000).cast("int"), lit(150).cast("int")).as("p"))
      .unionByName(spark.range(0, 40).select(($"id" + 1000L).as("clip"),
        MediaExpressions.wavPerturb(MediaExpressions.wavSynth($"id",
          lit(2).cast("int"), lit(8000).cast("int"), lit(150).cast("int"))).as("p")))
    val hashed = clips.select($"clip",
      element_at(MediaExpressions.wavEfp($"p"), 2).as("h64"))
    val pairs = Dedup.hamming64Pairs(hashed, "h64", "clip",
      maxHamming = 1, maxBucket = 1 << 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 40L).foreach(i =>
      assert(pairs.contains((i, i + 1000L)), s"twin pair $i missing"))
  }

  test("multimodal: GVID round-trips through real bytes; corrupt/adversarial -> all(-1)") {
    import graft.multimodal.{MediaExpressions, MediaKernels}
    val bytes = MediaKernels.vidSynth(7L, 5, 3, 4, 24000)
    assert(bytes(0) == 'G' && bytes(3) == 'D')
    assert(bytes.length == 28 + 5 * 3 * 3 * 4)
    val p = MediaKernels.vidParse(bytes)
    assert(p.getLong(0) == 5 && p.getLong(1) == 3 && p.getLong(2) == 4)
    assert(p.getLong(3) == 24000 && p.getLong(4) == 5 * 3 * 3 * 4)
    // duration: 4 frames at 24 fps = 166 ms (integer)
    assert(p.getLong(5) == 4L * 1000000 / 24000)
    // sum_b = Σ over f<4, x<5, y<3 of (7x + 13y + 7 + 7919f) % 256
    val expB = (for (f <- 0 until 4; x <- 0 until 5; y <- 0 until 3)
      yield ((x * 7L + y * 13 + 7 + 7919L * f) % 256)).sum
    assert(p.getLong(6) == expB)
    // corrupt payloads degrade to all(-1), never throw
    assert(MediaKernels.vidParse("nope".getBytes).getLong(0) == -1L)
    assert(MediaKernels.vidParse(bytes.take(20)).getLong(0) == -1L)
    def withLE32(b: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      c(off) = (v & 0xff).toByte; c(off + 1) = ((v >> 8) & 0xff).toByte
      c(off + 2) = ((v >> 16) & 0xff).toByte; c(off + 3) = ((v >> 24) & 0xff).toByte
      c
    }
    // ADVERSARIAL headers: int-overflowing dims, a frame count whose
    // data product wraps, a declared size that disagrees with the dims —
    // all must fail cleanly via the staged Long bounds, never walk OOB
    assert(MediaKernels.vidParse(withLE32(bytes, 8, 0x7FFFFFFF)).getLong(0) == -1L)
    assert(MediaKernels.vidParse(withLE32(bytes, 12, 0x40000000)).getLong(0) == -1L)
    assert(MediaKernels.vidParse(withLE32(bytes, 16, 0x7FFFFFFF)).getLong(0) == -1L)
    assert(MediaKernels.vidParse(withLE32(bytes, 24, 999)).getLong(0) == -1L)
    assert(MediaKernels.vidParse(withLE32(bytes, 4, 2)).getLong(0) == -1L) // version
    // zero-frame clip is VALID: data_bytes 0, duration 0
    val empty = MediaKernels.vidParse(MediaKernels.vidSynth(1L, 4, 3, 0, 12000))
    assert(empty.getLong(2) == 0 && empty.getLong(4) == 0 && empty.getLong(5) == 0)
    // expression level, inside a plan
    val out = spark.range(1, 4).select(
      MediaExpressions.vidParse(MediaExpressions.vidSynth(
        $"id", lit(4).cast("int"), lit(2).cast("int"),
        lit(3).cast("int"), lit(12000).cast("int"))).as("p"))
      .select(element_at($"p", 3)).as[Long].collect()
    assert(out.toSeq == Seq(3L, 3L, 3L))
  }

  test("multimodal: video majority-vote dHash is frame-noise-tolerant and band paired") {
    import graft.multimodal.{MediaExpressions, MediaKernels}
    def sig(b: Array[Byte]): (Long, Long) = {
      val a = MediaKernels.vidDhash(b); (a.getLong(0), a.getLong(1))
    }
    val clip = MediaKernels.vidSynth(42L, 20, 16, 5, 24000)
    val (ok, h) = sig(clip)
    assert(ok == 1L)
    // identity: same bytes, same signature
    assert(sig(MediaKernels.vidSynth(42L, 20, 16, 5, 24000)) == ((1L, h)))
    // one-frame ±1-pixel noise flips AT MOST one signature bit: the
    // perturbed cell joins exactly one comparison in exactly one frame,
    // so only bit 0's majority count can move, by at most 1
    val perturbed = MediaKernels.vidPerturb(clip)
    assert(!perturbed.sameElements(clip), "perturb must change the payload")
    val (okP, hP) = sig(perturbed)
    assert(okP == 1L && java.lang.Long.bitCount(h ^ hP) <= 1)
    // a single-frame GVID must agree bit-for-bit with bmpDhash on the
    // same pixel formulas: majority over one frame IS that frame's hash
    val one = MediaKernels.vidDhash(MediaKernels.vidSynth(9L, 20, 16, 1, 24000))
    val bmp = MediaKernels.bmpDhash(MediaKernels.bmpSynth(9L, 20, 16))
    assert(one.getLong(1) == bmp.getLong(1),
      "1-frame video signature must equal the frame's image dHash")
    // a different clip is far (deterministic fixture, > band threshold)
    val (_, hOther) = sig(MediaKernels.vidSynth(707L, 20, 16, 5, 24000))
    assert(java.lang.Long.bitCount(h ^ hOther) > 3,
      s"unrelated clips must not collide: ${java.lang.Long.bitCount(h ^ hOther)}")
    // degenerate dims leave grid cells empty; zero frames vote all-zero
    assert(sig(MediaKernels.vidSynth(1L, 4, 3, 2, 12000))._1 == 1L)
    assert(sig(MediaKernels.vidSynth(1L, 4, 3, 0, 12000)) == ((1L, 0L)))
    // corrupt payloads: ok=0, perturb passes bytes through unchanged
    assert(sig("junk".getBytes)._1 == 0L)
    assert(MediaKernels.vidPerturb("junk".getBytes).toSeq == "junk".getBytes.toSeq)

    // operator composition: planted twins surface through the SAME
    // Hamming band join every other sketch uses
    val clips = spark.range(0, 40).select($"id".as("vid"),
      MediaExpressions.vidSynth($"id", lit(20).cast("int"), lit(16).cast("int"),
        lit(5).cast("int"), lit(24000).cast("int")).as("p"))
      .unionByName(spark.range(0, 40).select(($"id" + 1000L).as("vid"),
        MediaExpressions.vidPerturb(MediaExpressions.vidSynth($"id",
          lit(20).cast("int"), lit(16).cast("int"),
          lit(5).cast("int"), lit(24000).cast("int"))).as("p")))
    val hashed = clips.select($"vid",
      element_at(MediaExpressions.vidDhash($"p"), 2).as("h64"))
    val pairs = Dedup.hamming64Pairs(hashed, "h64", "vid",
      maxHamming = 1, maxBucket = 1 << 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 40L).foreach(i =>
      assert(pairs.contains((i, i + 1000L)), s"twin pair $i missing"))
  }

  test("multimodal: synth size overflow fails legibly, not NegativeArraySizeException") {
    import graft.multimodal.MediaKernels
    // large-but-positive params whose Int byte-size products wrap
    // negative: both builders must raise a legible bound error instead
    // of allocating a wrapped/corrupt container
    val eb = intercept[IllegalArgumentException](
      MediaKernels.bmpSynth(1L, 50000, 50000))
    assert(eb.getMessage.contains("2 GiB"))
    val ew = intercept[IllegalArgumentException](
      MediaKernels.wavSynth(1L, 64, 8000, Int.MaxValue / 16))
    assert(ew.getMessage.contains("2 GiB"))
    val ev = intercept[IllegalArgumentException](
      MediaKernels.vidSynth(1L, 10000, 10000, 100, 24000))
    assert(ev.getMessage.contains("2 GiB"))
    // in-bound params still size correctly (Long math, no wrap):
    // 12 RIFF + (8+16) fmt + (8+8) junk (id=1 → junkLen 8) + (8+0) data
    assert(MediaKernels.wavSynth(1L, 1, 8000, 0).length == 12 + 24 + 16 + 8)
  }

  test("multimodal: BmpPixelDecoder does a REAL byte-level decode behind MediaDecoder") {
    import graft.multimodal.MediaKernels
    val dec = new Multimodal.BmpPixelDecoder
    // uniform test: a 1x1 image — means equal the single pixel's channels
    val one = MediaKernels.bmpSynth(3L, 1, 1)
    val f = dec.decode(one)
    assert(f.length == 3)
    assert(math.abs(f(2) - (3 % 256) / 255.0f) < 1e-6) // mean_b of pixel(0,0)
    assert(dec.decode("garbage".getBytes) == null)
    assert(dec.decode(null) == null)
    // flows through the same mapPartitions boundary as the stub
    val media = spark.range(0, 20).select($"id".as("media_id"),
      graft.multimodal.MediaExpressions.bmpSynth(
        $"id", lit(3).cast("int"), lit(2).cast("int")).as("payload"))
    val out = Multimodal.withFeatures(media, dec)
    assert(out.filter(size($"features") === 3).count() == 20)
  }

  test("multimodal: frame sampling and resize plans") {
    val media = Multimodal.synthetic(spark, 30)
    val frames = Multimodal.sampleOffsets(media.filter($"meta.duration_ms".isNotNull), 1000L, 4)
    assert(frames.groupBy("media_id").count().agg(max("count")).as[Long].head() <= 4)
    val resized = Multimodal.resizePlan(media.filter($"meta.width".isNotNull), 256)
    val bad = resized.filter($"target_width" > 256 || $"target_height" > 256).count()
    assert(bad == 0)
  }

  test("repetitionStats: [total, distinct, maxFreq] over token 3-grams") {
    val r = Seq(
      "a b c a b c a b",   // 6 grams: abc bca cab abc bca cab → 3 distinct, max 2
      "w x y z",           // 2 grams, both unique
      "hi there"           // shorter than the window → one whole-text gram
    ).toDF("t")
      .select(TextFunctions.repetitionStats($"t", 3).as("s"))
      .as[Seq[Long]].collect()
    assert(r(0) == Seq(6L, 3L, 2L))
    assert(r(1) == Seq(2L, 2L, 1L))
    assert(r(2) == Seq(1L, 1L, 1L))
  }

  // ---------------- segment dedup + PII scrub ----------------

  test("segmentDedup drops cross-doc boilerplate windows, keeps unique text in order") {
    // docs 1 and 2 share an identical 4-token boilerplate window at
    // DIFFERENT positions; doc 3 is untouched
    val df = Seq(
      (1L, "alpha beta gamma delta one two three four"),
      (2L, "one two three four epsilon zeta eta theta"),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id", segTokens = 4, maxDocFreq = 1)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    assert(out(0) == ((1L, "alpha beta gamma delta", 1L)))
    assert(out(1) == ((2L, "epsilon zeta eta theta", 1L)))
    assert(out(2) == ((3L, "nine ten eleven twelve thirteen fourteen fifteen sixteen", 0L)))
  }

  test("segmentDedup: a doc that is ALL boilerplate reduces to empty, partial windows count") {
    val df = Seq(
      (1L, "one two three four five"),  // 4-window + 1-token tail window
      (2L, "one two three four five"),  // exact duplicate doc
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id", segTokens = 4, maxDocFreq = 1)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    // both windows of docs 1/2 (including the short tail "five") repeat
    assert(out(0) == ((1L, "", 2L)))
    assert(out(1) == ((2L, "", 2L)))
    assert(out(2) == ((3L, "solo", 0L)))
  }

  test("segmentDedup passes NULL documents through instead of deleting them") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "a b"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "text", "doc_id", segTokens = 4, maxDocFreq = 1)
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out.length == 3)
    assert(out(0) == ((1L, null, 0L)))
    assert(out(1) == ((2L, "", 1L)) && out(2) == ((3L, "", 1L)))
  }

  test("ngramContainment: quote fully contained scores 1.0, Jaccard stays low") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps")  // a quote of doc 1's prefix
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val c = Dedup.ngramContainment(corpus, pairs, "text", "doc_id", n = 3)
      .select("containment").as[Double].head()
    assert(c == 1.0)
    val j = Dedup.ngramJaccard(corpus, pairs, "text", "doc_id", n = 3)
      .select("jaccard").as[Double].head()
    assert(j < 0.5, s"jaccard $j should be low where containment is 1.0")
  }

  test("semanticDedup keeps one survivor per embedding-cosine cluster") {
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val df = Seq(
      (1L, e1), (2L, e1), (3L, e1),   // one semantic cluster
      (5L, e2)                         // distinct
    ).toDF("id", "emb")
    val managed = Dedup.semanticDedup(df, "emb", "id", dim = 4, threshold = 0.99,
      numPlanes = 8)
    val survivors = managed.df.select("id").as[Long].collect().toSet
    managed.release()
    assert(survivors == Set(1L, 5L))
  }

  test("decontaminate removes corpus docs overlapping the benchmark, keeps clean ones") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words then alpha beta gamma delta epsilon zeta eta theta copied"),
      (2L, "completely clean document with none of the benchmark span present here"),
      (3L, "alpha beta gamma but only a short fragment nothing eight tokens long")
    ).toDF("doc_id", "text")
    val hits = Dedup.decontaminationHits(corpus, bench, "text", "doc_id", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(1L) && !hits.contains(2L) && !hits.contains(3L))
    val clean = Dedup.decontaminate(corpus, bench, "text", "doc_id", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
  }

  test("segmentDedup matches an in-memory reference on a random corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (1L to 40L).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val segTokens = 3
    def segsOf(t: String): Vector[String] =
      t.split(" ", -1).grouped(segTokens).map(_.mkString(" ")).toVector
    val docFreq = corpus.flatMap { case (id, t) => segsOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
    val expected = corpus.map { case (id, t) =>
      val ss = segsOf(t)
      (id, ss.filter(docFreq(_) <= 1).mkString(" "),
        ss.count(docFreq(_) > 1).toLong)
    }.sortBy(_._1)
    val got = Dedup.segmentDedup(corpus.toDF("doc_id", "text"),
        "text", "doc_id", segTokens = segTokens, maxDocFreq = 1)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("repetitionStats matches brute force on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("x", "y", "z")
    val corpus = (1 to 30).map { i =>
      val n = 1 + rnd.nextInt(9)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = corpus.toDF("id", "t")
      .select($"id", TextFunctions.repetitionStats($"t", 3).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    corpus.foreach { case (id, t) =>
      val toks = t.split(" ").toVector
      val grams = if (toks.size < 3) Vector(toks.mkString(" "))
                  else toks.sliding(3).map(_.mkString(" ")).toVector
      val maxFreq = grams.groupBy(identity).values.map(_.size).max
      assert(got(id) == Seq(grams.size.toLong, grams.distinct.size.toLong, maxFreq.toLong),
        s"doc $id '$t'")
    }
  }

  test("scrubPii redacts emails, phones, and IPv4s; leaves prose intact") {
    val df = Seq(
      "mail jane.doe+x@corp.example.org now",
      "call 555-123-4567 or +1 555.123.4567 today",
      "host 192.168.0.1 responded",
      "version 1.2 of chapter 3.4 is clean"
    ).toDF("t").select(TextFunctions.scrubPii($"t").as("c")).as[String].collect()
    assert(df(0) == "mail <PII> now")
    assert(df(1) == "call <PII> or +1 <PII> today")
    assert(df(2) == "host <PII> responded")
    assert(df(3) == "version 1.2 of chapter 3.4 is clean")
  }

  test("encodeTokenIds: literal-map and broadcast-join paths agree exactly") {
    val rnd = new scala.util.Random(7)
    val vocabPool = (0 until 120).map(i => s"w$i")
    val docs = (1L to 60L).map { i =>
      val n = 5 + rnd.nextInt(40)
      (i, Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.size))).mkString(" "))
    }.toDF("doc_id", "text")
    // same vocabSize, forced down each path via the threshold
    val viaLiteral = CorpusAudit.encodeTokenIds(docs, "doc_id", "text",
        vocabSize = 50, literalMapThreshold = 1000)
      .orderBy($"doc_id").collect().toSeq
    val viaJoin = CorpusAudit.encodeTokenIds(docs, "doc_id", "text",
        vocabSize = 50, literalMapThreshold = 10)
      .orderBy($"doc_id").collect().toSeq
    assert(viaLiteral == viaJoin)
    // sanity: some OOV zeros exist (vocab 50 < 120 distinct) and ids ≤ 50
    val ids = viaJoin.flatMap(_.getString(2).split(" ")).map(_.toLong)
    assert(ids.contains(0L) && ids.max <= 50L)
  }
}
