package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LSH bucket-width guard: a boilerplate-heavy corpus must not make
  * the band self-join quadratic in one reducer. */
class BucketGuardSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("guard bounds candidate pairs of a hot bucket and audits the trade") {
    // 100 byte-identical docs: unguarded, the band join yields all
    // C(100,2)=4950 pairs in every band's single bucket
    val docs = (0L until 100L).map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val unguarded = Dedup.minhashLshPairs(docs, "text", "doc_id",
      threshold = 0.7, maxBucket = 1000).count()
    assert(unguarded == 4950)
    val guarded = Dedup.minhashLshPairs(docs, "text", "doc_id",
      threshold = 0.7, maxBucket = 10)
    val n = guarded.count()
    // within-cell pairs only: ~10 cells of ~10 rows -> ~450 pairs, and the
    // guard must never exceed the unguarded set
    assert(n > 0 && n < 4950, s"guard did not bound the hot bucket: $n")
    // the audit reports the sacrificed buckets with widths and cell counts
    val audit = Dedup.minhashBucketAudit(docs, "text", "doc_id",
      threshold = 0.7, maxBucket = 10).collect()
    assert(audit.nonEmpty)
    assert(audit.forall(r => r.getAs[Long]("width") == 100L &&
      r.getAs[Long]("cells") == 10L))
  }

  test("pathological corpus (5k near-identical docs, one bucket) completes bounded") {
    val docs = (0L until 5000L)
      .map(i => (i, s"the quick brown fox jumps over the lazy dog variant ${i % 7}"))
      .toDF("doc_id", "text")
    // unguarded this is ~12.5M candidates per band; with maxBucket=50 each
    // band splits into ~100 cells of ~50 rows -> completes in seconds
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      threshold = 0.9, maxBucket = 50)
    val n = pairs.count()
    assert(n > 0, "guard should still find within-cell duplicates")
    // every surfaced pair is a true near-dup (verification still exact)
    assert(pairs.filter(col("jaccard") < 0.9).count() == 0)
  }

  test("guard leaves an un-skewed corpus untouched (default width)") {
    val docs = (0L until 200L).map(i => (i, s"completely distinct document body number $i " +
      s"with unique tokens token$i word$i item$i")).toDF("doc_id", "text")
    val base = Dedup.minhashLshPairs(docs, "text", "doc_id", threshold = 0.7)
      .select("id_a", "id_b").collect().toSet
    val guarded = Dedup.minhashLshPairs(docs, "text", "doc_id",
      threshold = 0.7, maxBucket = 100)
      .select("id_a", "id_b").collect().toSet
    assert(base == guarded)
  }

  test("simhash and embedding guards bound their hot buckets too") {
    val docs = (0L until 500L).map(i => (i, "identical text for every row"))
      .toDF("doc_id", "text")
    val sim = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 0, maxBucket = 25)
    val nSim = sim.count()
    assert(nSim > 0 && nSim < 500L * 499 / 2)

    val emb = (0L until 400L).map(i => (i, Array.fill(8)(0.5)))
      .toDF("vec_id", "embedding")
    val e = Dedup.embeddingNearDupPairs(emb, "embedding", "vec_id",
      dim = 8, threshold = 0.99, numPlanes = 16, maxBucket = 20)
    val nEmb = e.count()
    assert(nEmb > 0 && nEmb < 400L * 399 / 2)
  }
}
