package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (the 100 TB checklist): filters reach the
  * parquet scan, projections prune the read schema, small join sides
  * broadcast, hot paths stay inside whole-stage codegen. A plan regression
  * here is a scale bug even when results stay correct. */
class PlanSpec extends AnyFunSuite with SparkTestBase {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg pushes the shipdate filter into the parquet scan and prunes columns") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate,"), p)
    assert(p.contains("ReadSchema"), p)
    // only the 5 needed columns of 16 are read
    assert(!p.contains("l_orderkey"), "scan reads pruned column:\n" + p)
    assert(!p.contains("l_comment"), p)
  }

  test("q_find_unique compiles to a pushed-down point predicate, not a collect") {
    val p = planOf("q_find_unique")
    assert(p.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"), p)
  }

  test("q_join_left_count broadcasts no side (both large) but prunes orders columns") {
    val p = planOf("q_join_left_count")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderkey:bigint,o_totalprice:double>")
      || p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"),
      "orders scan not pruned to 3 columns:\n" + p)
  }

  test("relation-flag join broadcasts the aggregated flag side (AQE)") {
    val p = planOf("q_rel_some")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "expected broadcast for small flag side:\n" + p)
  }

  test("string filters stay inside whole-stage codegen") {
    val p = planOf("q_str_filters")
    // "*(n)" prefixes mark whole-stage-codegen stages in the compact plan
    assert(p.contains("*(1)"), p)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("StringEndsWith(p_type,DARD)"), p)
  }

  test("anti-join pushes the price filter to the orders scan") {
    val p = planOf("q_join_anti")
    assert(p.contains("GreaterThan(o_totalprice,300000.0)"), p)
  }

  test("take/skip pagination becomes a global limit, not a full materialization") {
    val p = planOf("q_find_many_page")
    assert(p.contains("GlobalLimit") || p.contains("TakeOrdered"), p)
  }

  test("filtered include's per-parent take is a PARTITIONED window + pushed filter") {
    val p = planOf("q_include_filtered")
    // the top-3-per-customer window partitions by the FK — never a global
    // single-reducer window
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("__gr_lk")),
      "expected FK-partitioned window(s):\n" + p)
    // the per-relation where reaches the orders scan
    assert(p.contains("GreaterThan(o_totalprice,100000.0)"),
      "per-relation filter not pushed to scan:\n" + p)
  }

  test("deciles plan has no window operator and no single-partition sort funnel") {
    val p = planOf("q_deciles")
    assert(!p.contains("Window ["), "ranking must not plan a window:\n" + p)
  }

  test("negative take plans as TakeOrdered (reverse sort-limit), not a full sort") {
    val p = planOf("q_take_last")
    assert(p.contains("TakeOrdered"), p)
  }

  test("repetition stats kernel evaluates once per row behind the barrier") {
    // AQE's toString prints Final AND Initial plans — count in the final only
    val p = planOf("q_repetition").split("== Initial Plan ==").head
    // without the eval-once fence, CollapseProject inlines the kernel into
    // all three stat extractions (measured 3x the scan cost)
    val kernelCount = "ngram_rep_stats".r.findAllIn(p).length
    assert(kernelCount == 1, s"expected ONE kernel call, found $kernelCount:\n" + p)
  }

  test("decontamination broadcasts the benchmark gram set") {
    val p = planOf("q_decontaminate")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "benchmark gram set must broadcast, never shuffle the corpus:\n" + p)
  }

  test("segment dedup: pruned scans, distributed keep-join, no single-partition funnel") {
    val p = planOf("q_segment_dedup")
    // both corpus scans read ONLY (doc_id, text) with the null filter pushed
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "corpus scan not pruned to 2 columns:\n" + p)
    assert(p.contains("PushedFilters: [IsNotNull(text)]"), p)
    // the keep-join broadcasts while the frequency table fits (AQE) —
    // at scale the same plan degrades to sort-merge, never to a loop
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    // and no stage funnels through one partition
    assert(!p.contains("SinglePartition"), "single-partition funnel:\n" + p)
  }

  test("per-source quota compiles to WindowGroupLimit (map-side bounded heaps)") {
    val p = planOf("q_source_quota")
    // rank<=n must push a group-limit below the shuffle: a 100 M-row
    // source then ships ~n rows per input partition, not the whole group
    assert(p.contains("WindowGroupLimit"), "no WindowGroupLimit:\n" + p)
    assert(p.contains("Partial"), "no map-side (Partial) group limit:\n" + p)
  }

  test("DSIR broadcasts the bucket LM and totals, never shuffles the gram stream to join") {
    val p = planOf("q_dsir")
    // both joins (1024-row LM, 1-row totals) must be broadcast hash joins;
    // a sort-merge join here would shuffle the full gram stream twice
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "LM/totals not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "gram stream shuffled for a join:\n" + p)
  }

  test("perplexity filter broadcasts the unigram LM, never shuffles the token stream to join") {
    val p = planOf("q_perplexity")
    // same contract as DSIR: the 4096-row LM and 1-row total broadcast
    // back over the token stream; a sort-merge join would shuffle every
    // token of a 100 TB corpus twice
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "LM/total not broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), "token stream shuffled for a join:\n" + p)
  }

  test("bloom decontamination probes scan-side, before any join") {
    val p = planOf("q_decontaminate_bloom")
    // the sketch probe is a codegen'd filter on the gram scan
    assert(p.contains("might_contain"), "no scan-side bloom probe:\n" + p)
    // and the exact verify join still exists (FP elimination)
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p)
  }

  test("chunking and splitting shuffle only for the output ORDER BY") {
    for (q <- Seq("q_chunk", "q_split")) {
      val p = planOf(q)
      // the operators are pure per-row expressions: any hash shuffle or
      // join in the plan means a regression broke the no-shuffle shape
      // (the range exchange for the deterministic output order is fine)
      assert(!p.contains("hashpartitioning"), s"$q compute shuffle:\n" + p)
      assert(!p.contains("Join"), s"$q grew a join:\n" + p)
    }
  }

  test("skew-proof as-of: the main window partitions on (key, time-bucket)") {
    val p = planOf("q_asof_skew")
    // The carry-forward pass over the big union (the one producing __last)
    // must spread a hot key over its time range: partition cols [__k, __b],
    // never [__k] alone. The per-key __carry window is exempt by design —
    // it runs over the per-bucket-last SUMMARY (one row per key×bucket).
    val mainSpecs = """AS __last#\d+\], \[([^\]]*)\]""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(mainSpecs.nonEmpty, "no __last window found:\n" + p)
    assert(mainSpecs.forall(s => s.contains("__k#") && s.contains("__b#")),
      s"main window not partitioned on (key, bucket): $mainSpecs")
    // the per-bucket-last extraction is likewise (key, bucket)-partitioned
    val rnSpecs = """AS __rn#\d+\], \[([^\]]*)\]""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(rnSpecs.forall(s => s.contains("__k#") && s.contains("__b#")),
      s"bucket-last window not partitioned on (key, bucket): $rnSpecs")
  }

  test("substring dedup: pruned scans, no nested-loop or cartesian join") {
    val p = planOf("q_substring_dedup")
    // the corpus scan reads only (doc_id, text)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "corpus scan not pruned to 2 columns:\n" + p)
    // gram ownership and marking are equi-joins — a nested loop here is
    // corpus × grams and cannot survive any scale-up
    assert(!p.contains("CartesianProduct"), "cartesian product:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"), "nested-loop join:\n" + p)
    // the island merge windows per document, never one partition
    assert(!p.contains("Window [") || !p.contains(", []"),
      "unpartitioned window:\n" + p)
  }

  test("large-vocab encoding joins the vocabulary frame, never a map literal") {
    // vocabSize 5000 > literalMapThreshold: the vocabulary must reach the
    // encoder as a BROADCAST join side — a 5k-entry map literal is a
    // codegen/constant-pool blow-up at real 32k–100k tokenizer vocabs
    val p = planOf("q_vocab_encode_large")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "large vocab must broadcast-join, not inline a literal:\n" + p)
    assert(!p.contains("keys: ["), "no map literal expected in plan")
    // the small-vocab path stays join-free (element_at against the literal)
    val small = planOf("q_vocab_encode")
    assert(!small.contains("Join"),
      "small-vocab path should encode scan-side without a join:\n" + small)
  }

  test("heavy hitters: sketch runs as a partial object aggregate, verify stays join-free") {
    // the verify pass is the plan the driver re-executes: a scan-side IN
    // filter over the ≤512 candidates + one candidate-keyed aggregation —
    // no join, no full-vocabulary shuffle
    val p = planOf("q_heavy_hitters")
    assert(!p.contains("Join"),
      "verify pass must filter scan-side, not join the candidate set:\n" + p)
    assert(p.contains("HashAggregate"), p)
    // the sketch aggregate itself (TypedImperativeAggregate) must plan as
    // ObjectHashAggregate with a partial phase — map tasks ship k counters,
    // not their vocabulary
    val toks = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("tok"))
    val sketch = toks.agg(
      graft.functions.MisraGries.heavyHitterCandidates(
        org.apache.spark.sql.functions.col("tok"), 512))
    val sp = sketch.queryExecution.executedPlan.toString
    assert(sp.contains("ObjectHashAggregate"), sp)
    assert(sp.contains("partial_misra_gries") || sp.contains("partial misra_gries")
      || sp.contains("Partial"), "sketch must partial-aggregate before the exchange:\n" + sp)
  }

  test("gopher filter evaluates each stat once: no regex re-inlined into the Filter") {
    // The round-10 fix: unpinned stat columns get re-inlined into one
    // FilterExec predicate whose codegen does no cross-predicate
    // subexpression elimination — the trim regexp re-ran ~15× per row
    // (19.8 s → 3.9 s at sf1). The barrier pins stats to their Project;
    // any Filter in the plan must reference computed attributes only.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.QualityRules.gopherFilter(docs, "text",
      graft.operators.QualityRules.Thresholds(minWords = 40, minStopwordHits = 1))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val filterLines = plan.linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(!filterLines.contains("regexp_replace") &&
      !filterLines.contains("regexp_extract_all") &&
      !filterLines.contains("tokenize"),
      "stat expressions re-inlined into the Filter predicate:\n" + filterLines)
  }

  test("pagerank: per-round contribution agg is partial, dimensions broadcast into the edge build") {
    val p = planOf("q_pagerank")
    assert(p.contains("BroadcastHashJoin"),
      "customer/supplier dims should broadcast into the edge aggregation:\n" + p)
    // no cartesian anywhere in the 5-round loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("naive interval join is rescued by the optimizer rule: no nested loop") {
    val p = planOf("q_range_rewrite")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "naive BETWEEN join still plans as a nested loop:\n" + p)
    assert(p.contains("__graft_bucket"),
      "bucket equi-join from RangeJoinRewrite missing:\n" + p)
  }

  test("rank metrics: query-partitioned window, reused exchange, broadcast IDCG") {
    val p = planOf("q_rank_metrics")
    // ranking positions come from a window partitioned by the query key —
    // never a global single-reducer sort
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("o_custkey")),
      "expected query-partitioned window(s):\n" + p)
    // the per-query aggregation rides the window's hash partitioning:
    // exactly ONE shuffle of the orders table (AQE's dump repeats the
    // initial plan below the final one — scope the count to the final)
    val finalPlan = p.split("== Initial Plan ==")(0)
    val exchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && l.contains("o_custkey"))
    assert(exchanges == 1,
      s"expected one o_custkey exchange (window + groupBy share it), got $exchanges:\n" + p)
    // the k-row IDCG lookup broadcasts
    assert(p.contains("BroadcastHashJoin"), "IDCG lookup should broadcast:\n" + p)
  }

  test("url filter: blocklist anti-join broadcasts, extraction stays codegen'd") {
    val p = planOf("q_url_filter")
    // the tiny blocklist must broadcast into a LeftAnti hash join — a
    // shuffled anti-join here would move the whole corpus for a 2-row list
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "blocklist should be a broadcast anti-join:\n" + p)
    assert(!p.contains("SortMergeJoin"), "corpus-side shuffle for the blocklist:\n" + p)
  }

  test("crawl front door: warc+html extraction is one scan-side project, no keyed shuffle") {
    val df = SparkEntry.queries("q_warc_extract")(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // permitted exchanges: the output ORDER BY's range partitioning, and
    // the r17 round-robin fan-out BELOW the extraction (the one-file test
    // corpus would otherwise run the whole gzip+WARC+HTML pipeline on a
    // single task — guide §2.5's unsplittable-input case; par() is a
    // no-op once the scan has enough splits). What must NEVER appear is
    // a KEYED shuffle: decode/extract stays embarrassingly parallel —
    // no hash partitioning moves the archive bytes by any key.
    val exchanges = finalPlan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(e =>
      e.contains("rangepartitioning") || e.contains("RoundRobinPartitioning")),
      "extraction should never shuffle by key:\n" + finalPlan)
  }
}
