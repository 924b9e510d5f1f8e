package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering: score every document with a hashed
  * bag-of-words LINEAR classifier (the fastText shape used by CCNet's
  * quality head, GPT-3/LLaMA's "looks-like-curated-pages" filter, and
  * FineWeb-Edu's educational-quality scorer), then threshold on the
  * sigmoid probability. The model is a weight-per-hash-bucket table —
  * exactly what a trained fastText/logistic model exports — so scoring
  * is pure dataflow: no inference service, no UDF.
  *
  * Scale shape (the production path, [[scoreWithModel]]):
  *   one tokenize+explode scan
  *   → broadcast hash join against the `dim`-row weight table
  *   → one per-document aggregation.
  * ONE shuffle, bounded by |docs|; the model broadcasts everywhere
  * (a 1M-bucket float model is ~8 MB — broadcastable at any corpus
  * size). The corpus never self-joins and nothing lands on the driver.
  *
  * Weights are INTEGER milliweights (w × 1000): partial sums stay in
  * exact long arithmetic across any partitioning, so the score is
  * bit-stable regardless of shuffle order — the only floats are one
  * final division and the sigmoid, both reproduced term-for-term by the
  * DuckDB oracle under the round-6 libm-parity contract (same as
  * BM25/DSIR).
  *
  * [[scoreInline]] is the distilled-model twin: when the weight rule is
  * expressible as a closed form (as this fixture's is), the whole score
  * folds into ONE codegen'd scan-side kernel — zero joins, zero
  * shuffles beyond the per-doc agg already embedded in `aggregate()`.
  * The two paths are asserted identical in QualityClassifierSpec.
  *
  * Reference analog: the pipeline's lead-quality heuristics
  * (src/services/scrapeWebsite.ts:184-194 scores scraped pages before
  * CRM ingestion); re-expressed as the corpus-scale classifier stage a
  * training-data pipeline runs between language ID and dedup.
  */
object QualityClassifier {

  /** Feature hash of one token: fold the ORACLE-PORTABLE md5 draw (the
    * family shared by [[Importance]]/[[Sampling]]) into `dim` buckets.
    * DuckDB mirror: `CAST(concat('0x', substr(md5(t),1,8)) AS UBIGINT)
    * % dim`. */
  def tokenBucket(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % dim

  /** The fixture "trained model": bucket b → milliweight
    * ((b*37 + 11) % 2001) - 1000 ∈ [-1000, 1000]. Integer arithmetic
    * only, so the oracle regenerates it exactly; in production this
    * frame is `spark.read.parquet(modelPath)` instead. */
  def syntheticModel(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(
      col("id").as("bucket"),
      ((col("id") * 37 + 11) % 2001 - 1000).as("w_milli"))

  private def finish(grouped: DataFrame, idCol: String): DataFrame = {
    // score s = Σw / (1000·n); prob = σ(s). The division and exp() are
    // the ONLY floating ops — mirrored shape-for-shape in the oracle.
    val s = col("__milli").cast("double") / (lit(1000.0) * col("n_tokens"))
    grouped
      .withColumn("edu_score", round(lit(1.0) / (lit(1.0) + exp(-s)), 6))
      .withColumn("keep", col("__milli") >= 0)
      .select(col(idCol), col("n_tokens"), col("edu_score"), col("keep"))
  }

  /** Production path: score against a weight TABLE (bucket, w_milli) —
    * the shape a real trained model loads as. Broadcast LEFT join (a
    * trained export commonly prunes zero/unseen buckets; a missing
    * bucket means weight 0, and the token still counts toward the
    * divisor — an inner join would silently shrink n_tokens and drop
    * all-miss documents entirely); one shuffle on `idCol`. Documents
    * with zero tokens carry no features and are excluded (same rule as
    * the oracle's GROUP BY). */
  def scoreWithModel(docs: DataFrame, textCol: String, idCol: String,
                     model: DataFrame, dim: Int): DataFrame = {
    val feats = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .withColumn("bucket", tokenBucket(col("__t"), dim))
    val joined = feats.join(broadcast(model), Seq("bucket"), "left")
      .withColumn("w_milli", coalesce(col("w_milli"), lit(0L)))
    finish(
      joined.groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        sum(col("w_milli")).as("__milli")),
      idCol)
  }

  /** Distilled path: the weight rule inlined as a codegen'd scan kernel —
    * zero joins. Only valid when the model IS a closed form; the spec
    * pins it to [[scoreWithModel]] output. */
  def scoreInline(docs: DataFrame, textCol: String, idCol: String,
                  dim: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val milli = aggregate(toks, lit(0L),
      (acc, t) => acc + (tokenBucket(t, dim) * 37 + 11) % 2001 - 1000)
    finish(
      docs.select(col(idCol), size(toks).as("n_tokens"), milli.as("__milli"))
        .filter(col("n_tokens") > 0),
      idCol)
  }

  /** [[scoreInline]]'s exact-integer face: (idCol, n_tokens,
    * score_milli) with the raw milliweight SUM instead of the sigmoid —
    * for consumers that rank or argmax on quality (dup-cluster
    * representative selection), where exact integer comparison beats a
    * rounded probability: no float enters the ordering at all, so the
    * chosen representative is bit-stable under any partitioning and
    * trivially oracle-replayable. Zero-token documents carry no
    * features and are excluded (the [[scoreInline]] rule). */
  def scoreMilli(docs: DataFrame, textCol: String, idCol: String,
                 dim: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val milli = aggregate(toks, lit(0L),
      (acc, t) => acc + (tokenBucket(t, dim) * 37 + 11) % 2001 - 1000)
    docs.select(col(idCol), size(toks).cast("long").as("n_tokens"),
        milli.as("score_milli"))
      .filter(col("n_tokens") > 0)
  }

  /** TRAIN the quality head — the half [[scoreWithModel]] assumed away.
    *
    * Logistic regression by full-batch gradient descent over the same
    * hashed bag-of-words features scoring uses, in the engine's integer
    * fixed-point discipline (q_kmeans / q_pagerank): every quantity a
    * shuffle can reorder is an EXACT integer (or DECIMAL) sum, and the
    * only floats are one division and the sigmoid per document per round,
    * each replayed term-for-term by the unrolled oracle. Per round:
    *
    *   feat(d,b)  = (count(d,b) · 1000) div n_d          — milli features
    *   s_d        = Σ_b w_b · feat(d,b) / 1e6            — one fp divide
    *   resid_d    = round(σ(s_d) · 1e6) − y_d · 1e6      — back to ints
    *   g_b        = Σ_d resid_d · feat(d,b)              — exact DECIMAL
    *   w_b       −= round(g_b · lr / (1e6 · N))          — HALF_UP
    *
    * Scale shape: the feature frame is built by ONE tokenize+explode scan
    * and persisted; each round is a broadcast join against the dim-row
    * weight table, one groupBy(doc) for residuals, one groupBy(bucket)
    * for gradients. Only the dim-row gradient ever reaches the driver —
    * the model is metadata-sized BY DESIGN (a 1M-bucket model collects
    * ~16 MB/round, the same bounded-by-k contract as kmeans' centroid
    * fold), the corpus never does. Gradient folds go through
    * DECIMAL(38,0): at 1e11 documents a Long would overflow; a decimal
    * sum stays exact and order-independent.
    *
    * `labelCol` is any 0/1 integer column (a seed heuristic, a curated
    * sample's labels). Weights start at zero (σ(0) = 0.5 exactly), so
    * round 1 is deterministic without an init draw. Returns the trained
    * (bucket, w_milli) frame — the exact shape [[scoreWithModel]] loads.
    */
  def train(docs: DataFrame, textCol: String, idCol: String,
            labelCol: String, dim: Int, iters: Int, lr: Double): DataFrame = {
    val spark = docs.sparkSession
    import org.apache.spark.storage.StorageLevel
    val toks = docs.select(col(idCol).as("__id"),
        col(labelCol).cast("long").as("__y"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
    val feats = toks
      .select(col("__id"), col("__y"), size(col("__toks")).as("__n"),
        explode(col("__toks")).as("__t"))
      .select(col("__id"), col("__y"), col("__n"),
        tokenBucket(col("__t"), dim).as("bucket"))
      .groupBy(col("__id"), col("__y"), col("__n"), col("bucket"))
      .agg(count(lit(1)).as("__c"))
      .select(col("__id"), col("__y"), col("bucket"),
        expr("(__c * 1000) div __n").as("feat"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = feats.select(col("__id")).distinct().count()
      require(nDocs > 0, "train: no documents with tokens")
      val w = Array.fill[Long](dim)(0L)
      for (_ <- 1 to iters) {
        val wDf = spark.createDataFrame(
          w.toIndexedSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) })
          .toDF("bucket", "w_milli")
        val resid = feats.join(broadcast(wDf), Seq("bucket"))
          .groupBy(col("__id"), col("__y"))
          .agg(sum((col("w_milli") * col("feat")).cast("decimal(38,0)"))
            .as("dot"))
          .select(col("__id"),
            (round(lit(1.0) / (lit(1.0) +
                exp(-(col("dot").cast("double") / lit(1000000.0))))
              * lit(1000000.0), 0).cast("long")
              - col("__y") * lit(1000000L)).as("resid"))
        val grad = feats.join(resid, Seq("__id"))
          .groupBy(col("bucket"))
          .agg(sum((col("resid") * col("feat")).cast("decimal(38,0)")).as("g"))
          .collect() // bounded by dim — the model IS metadata-sized
        grad.foreach { r =>
          val b = r.getLong(0).toInt
          val g = r.getDecimal(1).doubleValue()
          val delta = java.math.BigDecimal.valueOf(g * lr / (1e6 * nDocs))
            .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          w(b) -= delta
        }
      }
      spark.createDataFrame(
        w.toIndexedSeq.zipWithIndex.map { case (v, b) => (b.toLong, v) })
        .toDF("bucket", "w_milli")
    } finally feats.unpersist()
  }
}
