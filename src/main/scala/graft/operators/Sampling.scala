package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-keyed sampling for training-data curation.
  *
  * `df.sample()` draws from a per-partition PRNG: the subset changes with
  * partitioning, engine, and run — useless for reproducible corpus cuts or
  * cross-engine verification. Hash sampling keys the decision on the ROW
  * (md5 of a chosen key column): the same document is in or out of the
  * sample everywhere, forever — the property a 100 TB corpus needs so that
  * "the 1% eval split" stays fixed across reruns, engines, and cluster
  * layouts. Membership is a pure codegen'd filter (pushable, no shuffle,
  * no state).
  *
  * Mechanics: the first 8 hex chars of md5(key) are uniform over
  * [0, 16^8); a rate r keeps rows whose prefix is lexicographically below
  * the 8-hex-digit threshold floor(r·16^8) (lowercase-hex string order ==
  * numeric order, so the comparison stays a plain string `<` that any SQL
  * engine reproduces byte-identically).
  */
object Sampling {

  /** 8-hex-digit threshold for a sampling rate in [0, 1]. */
  def thresholdFor(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val t = math.min((rate * 4294967296.0).toLong, 4294967296L)
    if (t >= 4294967296L) "g" // above every hex digit → keep all
    else f"$t%08x"
  }

  /** THE membership predicate every deterministic-draw operator shares
    * ([[hashSample]], [[stratifiedHashSample]], [[Mixing]]'s fractional
    * epoch): one definition so the cross-operator guarantee — the same row
    * draws the same way everywhere — cannot drift. */
  def keepPredicate(key: Column, rate: Double): Column =
    drawBelow(key, lit(thresholdFor(rate)))

  /** The shared uniform draw digest. Null keys canonicalize to a fixed
    * sentinel BEFORE hashing: md5(null) is null, which silently DROPPED
    * null-key rows from hashSample/keepPredicate (filter(null) = drop,
    * even at rate 1.0) while hashSplitAssign's when-chain routed the same
    * rows to the fallback split — the "same row draws the same way
    * everywhere" contract diverged exactly on nulls. Coalescing a
    * POST-hash constant (not a pre-hash sentinel string) keeps the null
    * draw domain disjoint from every genuine key: no key's string cast
    * can deterministically reproduce this digest -- only a genuine md5
    * (prefix-)collision can, which is exactly as improbable as two
    * distinct non-null keys colliding, the risk the md5 draw already
    * accepts. (A pre-hash sentinel made any key literally EQUAL to the
    * sentinel string collide with nulls with probability 1.) The constant
    * is an arbitrary hex string -- the golden-ratio bit pattern -- not
    * the md5 of anything. */
  private[operators] def drawDigest(key: Column): Column =
    coalesce(md5(key.cast("string")), lit("9e3779b97f4a7c15f39cc0605cedc834"))

  private[operators] def drawBelow(key: Column, threshold: Column): Column =
    substring(drawDigest(key), 1, 8) < threshold

  /** Keep ~`rate` of rows, decided by md5 of `key` — deterministic,
    * partition-independent, engine-reproducible. */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(keepPredicate(key, rate))

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): row i gets priority u_i^(1/w_i) with u_i a uniform draw — here
    * the md5 draw shared by every operator in this file, so the same row
    * gets the same u everywhere — and the k largest priorities win.
    * P(i in sample) follows the weights exactly as in the E-S construction,
    * yet the result is reproducible across engines, partitionings, and
    * reruns (a plain PRNG reservoir gives a different corpus cut per run —
    * unusable for a pinned training mix).
    *
    * Computed as ln(u)/w (monotone in u^(1/w), no overflow for tiny u),
    * descending. Plan: scan + TakeOrdered(k) — per-partition bounded heaps,
    * no sort of the corpus, no shuffle beyond the k-row gather.
    * Ties broken by `tieBreak` ascending for engine-independent output.
    */
  def weightedPrioritySample(df: DataFrame, key: Column, weight: Column,
                             k: Int, tieBreak: Column): DataFrame = {
    val u = (conv(substring(drawDigest(key), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0)
    val priority = log(u) / weight.cast("double")
    // E-S is only defined for w > 0: a negative w flips ln(u)/w positive
    // (such rows would ALWAYS win the top-k) and 0/null yields -Inf/NaN.
    // Non-positive/null weights are excluded rather than corrupting the cut.
    df.filter(weight.cast("double") > 0d)
      .withColumn("__priority", priority)
      .orderBy(col("__priority").desc, tieBreak.asc)
      .limit(k)
      .drop("__priority")
  }

  /** Per-stratum deterministic rates (e.g. downsample dominant languages,
    * keep all of rare ones): `rates` maps stratum value → rate,
    * `defaultRate` applies to unlisted strata. One codegen'd CASE — no
    * join, no shuffle. */
  def stratifiedHashSample(df: DataFrame, key: Column, stratum: Column,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(thresholdFor(defaultRate))) {
      case (acc, (value, rate)) =>
        when(stratum === lit(value), lit(thresholdFor(rate))).otherwise(acc)
    }
    df.filter(drawBelow(key, threshold))
  }

  /** Per-group quota: keep at most `n` rows per group, preferring `order`
    * (the Common-Crawl-style "cap every domain at N documents" gate — one
    * over-represented source must not dominate the mixture).
    *
    * Scale: `row_number() <= n` compiles to `WindowGroupLimit` — Spark
    * keeps a bounded per-group heap on the MAP side before the shuffle,
    * so a group with 100 M rows ships ~n rows per input partition, not
    * 100 M, and the per-group sort never materializes (plan-asserted).
    * Order must be total (include a tiebreak) for deterministic output. */
  def capPerGroup(df: DataFrame, group: Column, n: Int,
                  order: Seq[Column]): DataFrame = {
    require(n > 0, "quota must be positive")
    require(order.nonEmpty,
      "capPerGroup needs a (total) order — an empty orderBy fails at plan " +
        "time and a non-total one keeps a partitioning-dependent subset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(order: _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Deterministic train/val/test split assignment by CONTENT hash:
    * cumulative md5 thresholds over `key`, so byte-identical content
    * always lands in the same split — exact duplicates can never leak
    * across the boundary (near-dup leakage composes with
    * [[Dedup.dupClusters]]: split on the cluster representative).
    * `cuts` are (name, cumulativeUpperBound) ascending, final name is the
    * remainder; e.g. `Seq(("train",0.8),("val",0.9))` + `"test"`.
    * Pure codegen'd CASE — no shuffle, no join, engine-reproducible. */
  def hashSplitAssign(key: Column, cuts: Seq[(String, Double)],
                      lastName: String): Column = {
    require(cuts.nonEmpty && cuts.map(_._2) == cuts.map(_._2).sorted,
      "cuts must be ascending cumulative bounds")
    val draw = substring(drawDigest(key), 1, 8)
    cuts.foldRight(lit(lastName): Column) { case ((name, ub), els) =>
      when(draw < lit(thresholdFor(ub)), lit(name)).otherwise(els)
    }
  }

  /** LEAKAGE-SAFE train/val/test split: the draw is keyed on the
    * document's near-duplicate CLUSTER representative, not the document
    * itself, so an entire near-dup cluster lands on ONE side of every
    * boundary — the eval-contamination failure mode a content-hash split
    * alone cannot prevent (near-duplicates hash differently; one lands in
    * train, its 99%-identical twin in test, and the benchmark is
    * compromised). This is the composition [[hashSplitAssign]]'s
    * contract points at: cluster first ([[Dedup.dupClusters]] over
    * MinHash-LSH pairs), then split on the representative.
    *
    * `clusters` is the (id, cluster) frame dupClusters emits — covering
    * only documents that appear in some near-dup pair. Documents without
    * a cluster are their own singleton (coalesce to own id), so the join
    * is a LEFT join and the operator degrades to a plain deterministic
    * split on a duplicate-free corpus.
    *
    * Plan shape: one hash join on id (the clusters side is the near-dup
    * subset — typically a small fraction of the corpus and broadcastable
    * when dup density is low) + the codegen'd CASE. No extra shuffle
    * beyond the join.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       cuts: Seq[(String, Double)],
                       lastName: String): DataFrame = {
    val cl = clusters.select(col("id").as("__cl_id"),
      col("cluster").as("__cluster"))
    // The representative keeps the id column's OWN type (dupClusters'
    // cluster label is a min over ids, so the two coalesce arms agree).
    // No cast to long here: for a string-id corpus that cast yielded
    // NULL for every unclustered document, and the null-coalescing draw
    // then dealt the ENTIRE duplicate-free remainder one shared digest —
    // one split swallowed it all. The draw casts to string instead,
    // which is the identity rendering for the long-id case and keeps
    // string ids distinct.
    df.join(cl, col(idCol) === col("__cl_id"), "left")
      .withColumn("cluster", coalesce(col("__cluster"), col(idCol)))
      .withColumn("split",
        hashSplitAssign(col("cluster").cast("string"), cuts, lastName))
      .drop("__cl_id", "__cluster")
  }
}
