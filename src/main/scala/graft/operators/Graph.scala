package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation beyond connected components: PageRank-style
  * importance propagation, the link-based quality signal web-scale corpus
  * curation uses to prioritize crawl sources (the reference's quality
  * gates are per-document; this is the cross-document complement).
  *
  * The whole computation runs in FIXED-POINT integer arithmetic (rank in
  * millionths, one floor division per edge): integer sums are exactly
  * order-independent, so the result is bit-identical however Spark
  * partitions the aggregation — which is what lets a distributed 5-round
  * propagation hash-match a single-threaded SQL oracle. A double-typed
  * PageRank can never promise that (FP addition does not commute across
  * partition orders); determinism here is a semantics choice, not an
  * implementation accident.
  *
  * Scale shape: per iteration, one hash join of the edge table against
  * the current rank vector on `src` followed by one `dst`-keyed partial
  * aggregation — the canonical distributed PageRank step (edges never
  * materialize per-node adjacency on the driver). Edge weights and
  * out-weights ride the pre-joined edge frame, built once. Overflow
  * bound: contrib = r·w·850 with r ≤ ~25e6 units and w ≤ ~2.4e7
  * (sf10 lineitem) stays under 2^63; at larger edge weights, pre-scale
  * weights down before calling.
  *
  * Fixed 5 iterations keeps the plan finite and the oracle unrollable;
  * production would loop to a delta threshold with `localCheckpoint`
  * lineage truncation every few rounds (same pattern as the distributed
  * dup-cluster loop in [[Dedup]]).
  */
object Graph {

  /** Loop-invariant materialization WITHOUT eager execution: persist the
    * InternalRow RDD ourselves and wrap it back as a LogicalRDD scan —
    * the plan is truncated like `localCheckpoint`, but nothing computes
    * until the first action over the returned frame (calling the
    * operator never runs Spark jobs — plan-only inspection stays free),
    * and the persisted blocks are reclaimed by the ContextCleaner once
    * the result frame is dropped, instead of orphaned checkpoint blocks
    * accumulating across calls in a long-lived session. Same pattern as
    * `Dedup.dupClustersManaged`'s truncation rounds. */
  private def materializeOnce(df: DataFrame): DataFrame = {
    val rdd = org.apache.spark.sql.graftbridge.InternalRowBridge
      .toRdd(df).map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    org.apache.spark.sql.graftbridge.InternalRowBridge
      .fromRdd(df.sparkSession, rdd, df.schema)
  }

  /** Host→host outlink edges of a crawled corpus (r16): the natural
    * composition of three shipped components — [[graft.functions
    * .HtmlKernels.links]] pulls every `<a href>`, [[graft.functions
    * .UrlKernels.resolveUrl]] absolutizes it against the page's own URL,
    * and `urlHost` collapses both ends to hosts; parallel links fold to
    * one weighted edge. Feed the result (with hosts mapped to long ids)
    * into [[pageRankFixedPoint]] for crawl-frontier source scoring —
    * RefinedWeb/CC-style link-quality prioritization. Scale shape: the
    * extraction is a codegen'd scan-side generate (zero shuffles); the
    * fold is ONE (src,dst)-keyed partial aggregation.
    *
    * @param pages  one row per fetched page
    * @param urlCol the page's fetched URL column
    * @param htmlCol the page's raw HTML column
    * @return (src_host, dst_host, w) — unresolvable/hostless ends drop
    */
  def crawlHostEdges(pages: DataFrame, urlCol: String,
                     htmlCol: String): DataFrame = {
    val H = graft.functions.HtmlExpressions
    val U = graft.functions.UrlExpressions
    pages
      .select(U.urlHost(col(urlCol)).as("src_host"), col(urlCol).as("__base"),
        explode(H.htmlLinks(col(htmlCol))).as("__href"))
      .select(col("src_host"),
        U.urlHost(U.urlResolve(col("__base"), col("__href"))).as("dst_host"))
      .filter(col("src_host").isNotNull && col("dst_host").isNotNull)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("w"))
  }

  /** Five rounds of damped (0.85) importance propagation over a weighted
    * directed graph, in millionth-units: every node starts at 1_000_000;
    * each round `r(v) = 150000 + Σ_incoming (r(u)·w(u,v)·850) div
    * (outw(u)·1000)` (per-edge floor; dangling mass is dropped, the
    * standard simplification). Output: (id, r) with r as LONG units.
    *
    * @param edges (src: long, dst: long, w: long) weighted edges
    * @param nodes (id: long) the node universe (isolated nodes keep the
    *              teleport mass only)
    */
  def pageRankFixedPoint(edges: DataFrame, nodes: DataFrame,
                         iters: Int = 5): DataFrame = {
    // Non-positive/null weights are excluded up front (the same contract
    // Sampling.weightedPrioritySample enforces): a source whose out-weight
    // sums to 0 would divide by zero in the contribution step — null per-
    // edge contributions silently dropped by sum() (the node's whole rank
    // mass vanishes), or a runtime error under ANSI mode.
    val posEdges = edges.filter(col("w").isNotNull && col("w") > 0L)
    val outw = posEdges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    // (src, dst, w, ow) — MATERIALIZED once (lazily, on first action):
    // the frame is loop-invariant but referenced by every round, so
    // without the cut the caller's whole edge-derivation plan (a
    // fact-table star join, a crawl extraction) replays per round —
    // exchange reuse sometimes saves it, but the materialized edge list
    // makes the rounds' cost independent of how expensive the edges
    // were to derive
    val e = materializeOnce(posEdges.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("ow")))
    var ranks = nodes.select(col("id"), lit(1000000L).as("r"))
    var i = 0
    while (i < iters) {
      val contribs = e.join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          expr("(r * w * 850) div (ow * 1000)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), (lit(150000L) + coalesce(col("s"), lit(0L))).as("r"))
      i += 1
    }
    ranks
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007)
    * over the undirected weighted closure — the cheap community detector
    * corpus curation runs to group near-dup CLUSTERS into sources/topics
    * (connected components answer "touching?"; this answers "densely
    * trading together?"). Every node starts labeled with its own id;
    * each round it adopts the label with the greatest incident edge
    * weight among its neighbors (tie → smallest label; isolated nodes
    * keep theirs). Integer weight sums + id tie-breaks make every round
    * bit-deterministic under any partitioning — the same
    * determinism-as-semantics contract as [[pageRankFixedPoint]], so the
    * oracle replays all rounds as unrolled CTEs.
    *
    * Scale shape per round: one hash join of the symmetric edge frame
    * against the label vector on the neighbor key, one (node, label)
    * partial aggregation, one per-node argmax (`max_by`, map-side
    * combinable) — never adjacency on the driver. Fixed `iters` keeps
    * the oracle unrollable; production loops to label-change delta with
    * periodic `localCheckpoint` truncation.
    *
    * @param edges (src, dst, w) directed weighted edges (symmetrized,
    *              self-loops dropped, parallel edges weight-summed)
    * @param nodes (id) node universe
    * @return (id, community) — the label after `iters` rounds
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
                       iters: Int = 4): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("wu"))
    // symmetric closure MATERIALIZED once (lazily): referenced by every
    // round — same loop-invariant cut as pageRankFixedPoint
    val sym = materializeOnce(
      und.select(col("a").as("v"), col("b").as("u"), col("wu"))
        .unionAll(und.select(col("b").as("v"), col("a").as("u"), col("wu"))))
    var labels = nodes.select(col("id"), col("id").as("lbl"))
    var i = 0
    while (i < iters) {
      val votes = sym
        .join(labels.select(col("id").as("u"), col("lbl")), "u")
        .groupBy(col("v"), col("lbl")).agg(sum(col("wu")).as("s"))
        .groupBy(col("v"))
        .agg(max_by(col("lbl"), struct(col("s"), -col("lbl"))).as("best"))
      labels = labels
        .join(votes.withColumnRenamed("v", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("best"), col("lbl")).as("lbl"))
      i += 1
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Per-node triangle participation counts over an UNDIRECTED simple
    * graph — the local clustering signal (community density, link-farm
    * detection) that complements [[pageRankFixedPoint]]'s global
    * importance.
    *
    * Input edges may be directed/duplicated/weighted; they are first
    * canonicalized to distinct unordered pairs (a < b). Triangles are
    * enumerated once each by the ordered two-join: wedge a<b<c from
    * edges (a,b)⋈(b,c), closed by probing (a,c) — the standard
    * distributed pattern (node-iterator via join). Both joins are plain
    * hash equi-joins; fan-out per wedge hub is C(deg,2), so a
    * power-law hub dominates — at web scale, cap or sample hub
    * neighborhoods upstream (degree-threshold split), same hot-key story
    * as every self-join here. Every triangle (a,b,c) credits all three
    * corners; nodes in no triangle report 0.
    *
    * @param edges (src: long, dst: long, ...) directed edge list
    * @param nodes (id: long) node universe (for the zero rows)
    */
  def triangleCounts(edges: DataFrame, nodes: DataFrame): DataFrame = {
    // the canonical pair set appears THREE times in the wedge-close plan
    // (wedge left, wedge right, closing probe) — materialize it once so
    // the caller's edge derivation never replays per reference
    val und = materializeOnce(edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val wedges = und.join(
        und.select(col("a").as("b2"), col("b").as("c")),
        col("b") === col("b2"))
      .select(col("a"), col("b"), col("c"))
    val tris = wedges.join(
        und.select(col("a").as("a3"), col("b").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    val corner = tris.select(col("a").as("id"))
      .unionAll(tris.select(col("b").as("id")))
      .unionAll(tris.select(col("c").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    nodes.join(corner, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** The trade graph the gate runs PageRank over: customer-nation →
    * supplier-nation edges weighted by lineitem count, from the
    * lineitem⋈orders⋈customer⋈supplier star (one aggregation over the
    * fact scan; the three dimension joins are broadcast-able). */
  def nationTradeEdges(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame, supplier: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
      .select(col("src").cast("long"), col("dst").cast("long"), col("w"))
}
