package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, as a training-data pipeline needs both:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline
  *     and the right answer when the query set is small (broadcast the
  *     queries, one scan of the corpus, per-query top-k via window);
  *   - [[lshTopK]]: hyperplane-LSH bucketed search — the 100 TB path; the
  *     corpus is bucketed once (signature is a per-row expression), each
  *     query probes only its multi-probe bucket set, recall traded via
  *     `numPlanes`/`maxHammingProbe`.
  *
  * All vector math is codegen'd `zip_with`/`aggregate` — no UDFs.
  */
object Similarity {

  import Dedup.{dot, norm}

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query row.
    *
    * @param corpus  (idCol, embCol) — the big side, scanned once
    * @param queries (qidCol, embCol) — small; Catalyst broadcasts it
    * @return (qid, id, cosine, rank) with rank 1..k per qid
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     embCol: String, idCol: String, qidCol: String,
                     k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("__ce"))
      .withColumn("__cn", norm(col("__ce")))
    val q = queries.select(col(qidCol).as("qid"),
      col(embCol).cast("array<double>").as("__qe"))
      .withColumn("__qn", norm(col("__qe")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", dot(col("__ce"), col("__qe")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** Exact top-k via the bounded-heap aggregate
    * ([[graft.functions.TopK]]) — same results as [[bruteForceTopK]], but
    * ranking is a partially-aggregated groupBy: each map task ships at
    * most k candidates per query instead of the window path's full
    * per-key candidate sort. The at-scale form of the same operator. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame,
                        embCol: String, idCol: String, qidCol: String,
                        k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("__ce"))
      .withColumn("__cn", norm(col("__ce")))
    val q = queries.select(col(qidCol).as("qid"),
      col(embCol).cast("array<double>").as("__qe"))
      .withColumn("__qn", norm(col("__qe")))
    c.crossJoin(broadcast(q))
      .withColumn("__cos", dot(col("__ce"), col("__qe")) / (col("__cn") * col("__qn")))
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.topK(col("__cos"), col("id"), k).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("id"),
        round(col("t.score"), 4).as("cosine"), col("t.rank").as("rank"))
  }

  /** Per-vector symmetric int8 quantization: `scale = max|x| / 127`,
    * `code_i = round(x_i / scale)` ∈ [-127, 127]. The memory lever for
    * corpus-scale ANN: 100 TB of float32 embeddings become ~25 TB of
    * codes (+ one scale per row), which is the difference between a
    * scored scan living in page cache and thrashing it. Reconstruction
    * error is bounded by `scale/2` per component (exact rounding
    * property, spec-asserted); zero vectors quantize to zero codes.
    * Codes stay `ARRAY<INT>` here for engine portability — a cluster
    * deployment would pack them to BINARY at the storage boundary. */
  def quantizeInt8(df: DataFrame, embCol: String,
                   scaleCol: String = "qscale",
                   codesCol: String = "qcodes"): DataFrame = {
    val e = col(embCol).cast("array<double>")
    // barrier: the scale aggregate feeds every element of the codes
    // transform — CollapseProject would otherwise re-inline the max-abs
    // fold into each lambda evaluation
    val scale = graft.functions.Barrier.evalOnce(
      aggregate(e, lit(0.0), (acc, x) => greatest(acc, abs(x))) / lit(127.0))
    df.withColumn(scaleCol, scale)
      .withColumn(codesCol, transform(e, x =>
        when(col(scaleCol) === 0.0, lit(0.0))
          .otherwise(round(x / col(scaleCol))).cast("int")))
  }

  /** Reconstruct the search-space vector from int8 codes. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Exact top-k over the int8-QUANTIZED corpus (queries stay full
    * precision — the standard asymmetric search): quantize, dequantize,
    * rank by cosine through the bounded-heap aggregate. Recall vs the
    * float corpus is spec-asserted; the point is the 4× smaller scan. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    embCol: String, idCol: String, qidCol: String,
                    k: Int = 10): DataFrame = {
    val qc = quantizeInt8(corpus, embCol)
      .select(col(idCol), dequantize(col("qcodes"), col("qscale")).as("__deq"))
    val q = queries.select(col(qidCol), col(embCol).cast("array<double>").as("__deq"))
    bruteForceTopKAgg(qc, q, "__deq", idCol, qidCol, k)
  }

  /** Hard-negative mining for contrastive/retrieval training (the
    * DPR-style recipe, Karpukhin et al. 2020): for each query, the top-k
    * most-similar corpus items whose cosine lies INSIDE `(loCos, hiCos]`
    * — similar enough to be informative negatives, capped below the
    * near-duplicate band that would poison the label (a near-copy of the
    * positive is not a negative). Self-matches sit at cosine 1.0 and fall
    * out of any `hiCos < 1` band.
    *
    * Same scale shape as [[bruteForceTopKAgg]]: queries broadcast over
    * one corpus scan, band filter evaluated scan-side, bounded-heap TopK
    * partial aggregation — at most k candidates per query leave each
    * partition, so the shuffle is |queries|·k rows regardless of corpus
    * size. For corpus-scale query sets, block first (IVF/LSH) and band
    * inside the bucket. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    embCol: String, idCol: String, qidCol: String,
                    k: Int = 10, loCos: Double = 0.0,
                    hiCos: Double = 0.95): DataFrame = {
    require(loCos < hiCos, "band must be non-empty")
    val c = corpus.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("__ce"))
      .withColumn("__cn", norm(col("__ce")))
    val q = queries.select(col(qidCol).as("qid"),
      col(embCol).cast("array<double>").as("__qe"))
      .withColumn("__qn", norm(col("__qe")))
    c.crossJoin(broadcast(q))
      .withColumn("__cos", dot(col("__ce"), col("__qe")) / (col("__cn") * col("__qn")))
      .filter(col("__cos") > loCos && col("__cos") <= hiCos)
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.topK(col("__cos"), col("id"), k).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("id"), col("t.rank").cast("long").as("rank"))
  }

  /** IVF (inverted-file) ANN: the corpus is clustered once (deterministic
    * seeding + a few Lloyd refinements, all as DataFrame plans); a query
    * probes only its `nProbe` nearest centroids' posting lists. The
    * centroid set is small → broadcast everywhere; the corpus shuffles
    * once on cluster id. The classic alternative to [[lshTopK]] when the
    * data is clusterable.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              embCol: String, idCol: String, qidCol: String,
              k: Int = 10, nCenters: Int = 16, nProbe: Int = 3,
              lloydIters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("__ce"))
      .withColumn("__cn", norm(col("__ce")))

    // deterministic init: the nCenters rows with smallest hash(id).
    // Collected to the driver — nCenters embeddings, bounded regardless of
    // corpus size (they are broadcast to every task anyway), and it avoids
    // a no-partition window (even a 16-row one trips the WindowExec
    // single-partition warning).
    //
    // Centers live on the DRIVER between Lloyd rounds (collect → literal
    // LocalRelation): a derived-plan centers DataFrame would either recompute
    // its whole lineage per reference or need a cache the operator can never
    // release (the round-2 version leaked three such caches into every later
    // query of the session). A LocalRelation broadcast costs nothing to
    // re-reference and holds no executor memory after the job.
    val spark = corpus.sparkSession
    import spark.implicits._
    val initRows = c.withColumn("__h", hash(col("id")))
      .orderBy(col("__h"), col("id")).limit(nCenters)
      .select(col("__ce")).collect()
    var centers: IndexedSeq[(Long, Seq[Double])] = initRows.toIndexedSeq.zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](0)) }

    def centersDf = centers.toDF("cid", "__cent")

    def assign(points: DataFrame): DataFrame = {
      // centroid norms precomputed once on the broadcast side — norm() per
      // (point × center) pair would redo the same dim-length loop n times
      val cent = centersDf.withColumn("__centn", norm(col("__cent")))
      val scored = points.crossJoin(broadcast(cent))
        .withColumn("__sim", dot(col("__ce"), col("__cent")) /
          (col("__cn") * col("__centn")))
      // argmax by aggregation (max_by), not a window sort — one partial-
      // aggregable shuffle on id instead of a full sort within partitions;
      // tie-break on smallest cid keeps it deterministic
      scored.groupBy(col("id"))
        .agg(
          max_by(col("cid"), struct(col("__sim"), -col("cid"))).as("cid"),
          first(col("__ce")).as("__ce"),
          first(col("__cn")).as("__cn"))
        .select(col("id"), col("__ce"), col("__cn"), col("cid"))
    }

    // Lloyd refinement: new center = mean of assigned members, collected to
    // the driver (nCenters × dim doubles — metadata-sized at any corpus
    // scale). One corpus scan per round, zero persistent state.
    (1 to lloydIters).foreach { _ =>
      centers = assign(c)
        .select(col("cid"), posexplode(col("__ce")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("v"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
        .select(col("cid"), transform(col("pv"), x => x.getField("v")).as("__cent"))
        .collect().toIndexedSeq
        .map(r => (r.getLong(0), r.getSeq[Double](1)))
    }
    val index = assign(c) // posting lists: cluster id per corpus row

    // query side: nProbe nearest centers each
    val q = queries.select(col(qidCol).as("qid"),
        col(embCol).cast("array<double>").as("__qe"))
      .withColumn("__qn", norm(col("__qe")))
    val centN = centersDf.withColumn("__centn", norm(col("__cent")))
    val qScored = q.crossJoin(broadcast(centN))
      .withColumn("__sim", dot(col("__qe"), col("__cent")) /
        (col("__qn") * col("__centn")))
    val wq = Window.partitionBy(col("qid")).orderBy(col("__sim").desc, col("cid"))
    val probes = qScored.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nProbe)
      .select(col("qid"), col("__qe"), col("__qn"), col("cid"))

    val candidates = index.join(broadcast(probes), Seq("cid"))
      .withColumn("cosine", dot(col("__ce"), col("__qe")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: corpus rows carry a hyperplane signature; a query
    * probes every bucket within `maxHammingProbe` bit flips of its own
    * signature (multi-probe), then ranks candidates by exact cosine.
    * Recall < 1 by design; raise planes/probes for more. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              embCol: String, idCol: String, qidCol: String,
              dim: Int, k: Int = 10, numPlanes: Int = 12,
              maxHammingProbe: Int = 1, seed: Long = 42L): DataFrame = {
    val sig = Dedup.hyperplaneSignature(col(embCol), numPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("id"),
        col(embCol).cast("array<double>").as("__ce"), sig.as("__bucket"))
      .withColumn("__cn", norm(col("__ce")))

    // Probe set: every signature within `maxHammingProbe` bit flips —
    // ALL of them, not a truncation (a radius the parameter promises but
    // the probe list doesn't honor would silently lose recall). The probe
    // count is sum_{r<=R} C(numPlanes, r), materialized driver-side as
    // XOR masks; the guard keeps an over-eager radius from exploding the
    // broadcast query side.
    require(maxHammingProbe >= 0 && maxHammingProbe <= numPlanes,
      s"maxHammingProbe $maxHammingProbe outside [0, $numPlanes]")
    // bound the probe count ARITHMETICALLY before generating any mask —
    // a guard after materialization would OOM on the inputs it exists
    // for. Incremental C(n,r) with early exit: once the running total
    // passes the cap we stop, so no intermediate can overflow.
    val probeCount = {
      var total = 0L; var c = 1L; var r = 0
      while (r <= maxHammingProbe && total <= 8192) {
        total += c
        c = c * (numPlanes - r) / (r + 1)
        r += 1
      }
      total
    }
    require(probeCount <= 8192,
      s"probe set >$probeCount masks: lower maxHammingProbe or numPlanes")
    val flipMasks: Seq[Long] = (0 to maxHammingProbe).flatMap { r =>
      (0 until numPlanes).combinations(r)
        .map(_.foldLeft(0L)((m, i) => m | (1L << i))).toSeq
    }
    val probes: Seq[Column] =
      flipMasks.map(m => if (m == 0L) sig else sig.bitwiseXOR(lit(m)))
    val q = queries.select(col(qidCol).as("qid"),
        col(embCol).cast("array<double>").as("__qe"),
        explode(array_distinct(array(probes: _*))).as("__bucket"))
      .withColumn("__qn", norm(col("__qe")))

    val candidates = c.join(broadcast(q), Seq("__bucket"))
      .dropDuplicates("qid", "id")
      .withColumn("cosine", dot(col("__ce"), col("__qe")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
