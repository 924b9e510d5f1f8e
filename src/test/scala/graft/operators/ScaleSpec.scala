package graft.operators

import graft.SparkTestBase
import graft.pipeline._
import graft.store.Catalog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Scale primitives: salted joins, skew recon, partition-pruned polls. */
class ScaleSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("AQE skew-join fires on a planted hot key (built-in path validated)") {
    // The manual rewrites (saltedJoin/twoPhaseCollect) are for a-priori
    // known hot keys; AQE's runtime skew split is the first line of
    // defense and must be VALIDATED firing, not assumed — thresholds are
    // lowered to make a test-sized hot partition legible to the planner.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // hot key 0 carries ~95% of the left side's bytes
      val left = spark.range(0, 60000)
        .select((when(col("id") % 20 === 0, col("id") % 50).otherwise(lit(0L))).as("k"),
          concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(0, 50).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("name"))
      val joined = left.join(right, Seq("k"))
      assert(joined.collect().length == 60000) // run THIS plan so AQE finalizes it
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("saltedJoin matches the plain join result on a skewed key") {
    // 90% of left rows share one hot key
    val left = spark.range(2000)
      .select(when($"id" < 1800, lit(7L)).otherwise($"id" % 50).as("k"), $"id".as("v"))
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(left, right, "k", factor = 8).select("k", "v", "name")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin preserves left rows for left joins") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "no-match")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = Skew.saltedJoin(left, right, "k", factor = 4, joinType = "left")
    assert(out.count() == 3)
    assert(out.filter($"k" === 99L).head().getAs[String]("w") == null)
  }

  test("twoPhaseCollect aggregates hot keys in two phases, same multiset") {
    val df = spark.range(1000)
      .select(when($"id" < 900, lit(1L)).otherwise(($"id" % 10) + 100L).as("k"),
        $"id".cast("string").as("v"))
    val out = Skew.twoPhaseCollect(df, "k", "v", factor = 4)
    val hot = out.filter($"k" === 1L).select(size($"v_list")).as[Int].head()
    assert(hot == 900)
  }

  test("hotKeys surfaces the dominant key") {
    val df = spark.range(500).select(when($"id" < 400, lit(42L)).otherwise($"id").as("k"))
    val top = Skew.hotKeys(df, "k", 1).head()
    assert(top.getAs[Long]("k") == 42L && top.getAs[Long]("n") == 400L)
  }

  test("segmentDedup survives a pathological hot segment (boilerplate in every doc)") {
    // 5000 docs all share one boilerplate window; each also has unique text
    val docs = spark.range(5000).select($"id".as("doc_id"),
      concat(lit("copyright footer all rights reserved worldwide "),
        lit("unique body "), $"id".cast("string")).as("text"))
    val out = Dedup.segmentDedup(docs, "text", "doc_id", segTokens = 6, maxDocFreq = 1)
    // every doc keeps its unique tail, loses the shared window
    assert(out.count() == 5000)
    assert(out.filter($"droppedSegments" === 0).count() == 0)
    assert(out.filter($"text".contains("copyright")).count() == 0)
    assert(out.filter($"text".contains("unique body")).count() == 5000)
  }

  test("decontaminate with an empty benchmark keeps the whole corpus") {
    val corpus = Seq((1L, "some words here for the corpus document one two three four five"))
      .toDF("doc_id", "text")
    val bench = corpus.filter(lit(false))
    assert(Dedup.decontaminationHits(corpus, bench, "text", "doc_id").count() == 0)
    assert(Dedup.decontaminate(corpus, bench, "text", "doc_id").count() == 1)
  }

  test("status-partitioned queue table: pending poll prunes partitions") {
    val st = new PipelineStore(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-part").toString))
    val urls = (1 to 30).map(i => (s"g$i", s"https://x.example/$i", Some("L")))
      .toDF("id", "url", "location")
      .withColumn("status", when($"id".isin("g1", "g2"), lit(true))
        .when($"id" === "g3", lit(false)).otherwise(lit(null).cast(BooleanType)))
      .withColumn("notes", lit(null).cast(StringType))
      .withColumn("createdAt", lit(null).cast(TimestampType))
      .withColumn("updatedAt", lit(null).cast(TimestampType))
    st.urls.createMany(urls)

    val snap = st.urls.snapshot()
    assert(snap.count() == 30)
    // values survive the partitioned round-trip (incl. the null partition)
    assert(snap.filter($"status".isNull).count() == 27)
    assert(snap.filter($"status" <=> true).count() == 2)

    // the poll path lists ONLY the pending slice's directory — catalog-level
    // pruning, stronger than Hive PartitionFilters (no listing of other
    // slices at all)
    val pending = st.urls.snapshotSlice(Map("status" -> null))
    assert(pending.count() == 27)
    val plan = pending.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryFileIndex(1 paths)"),
      "poll does not prune to one slice directory:\n" + plan)
    val files = pending.inputFiles
    assert(files.nonEmpty && files.forall(f =>
      f.contains("status=__NULL__") || f.contains("status%3D__NULL__")),
      "pruned files should all live in the NULL-status slice: " + files.mkString(", "))
  }

  test("dynamic partition pruning: date-partitioned facts pruned by a filtered dim join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp")
    // fact table partitioned by day — the 100 TB events layout
    graft.Tables.events(spark, sfDir)
      .withColumn("day", to_date($"ts"))
      .write.mode("overwrite").partitionBy("day").parquet(tmp.toString)
    val facts = spark.read.parquet(tmp.toString)
    val nDays = facts.select("day").distinct().count()
    assert(nDays > 3, s"need multiple partitions, got $nDays")
    // independent parquet dim with its own selective filter: 2 days flagged
    // (an in-memory dim gets its filter constant-folded into the local
    // relation, which defeats DPP's selective-predicate detection)
    val allDays = facts.select("day").distinct().orderBy("day")
      .collect().map(_.getDate(0))
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim")
      .resolve("d").toString
    allDays.zipWithIndex
      .map { case (d, i) => (d, if (i < 2) "keep" else "drop") }.toSeq
      .toDF("day", "flag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = facts.join(dim.filter($"flag" === "keep"), Seq("day"))
      .groupBy($"day").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "no dynamic partition pruning in plan:\n" + plan)
  }

  test("partitioned table updates rewrite correctly (status flip moves partition)") {
    val st = new PipelineStore(spark,
      new Catalog(java.nio.file.Files.createTempDirectory("graft-part2").toString))
    val urls = Seq(("g1", "https://a.example", Some("L")))
      .toDF("id", "url", "location")
      .withColumn("status", lit(null).cast(BooleanType))
      .withColumn("notes", lit(null).cast(StringType))
      .withColumn("createdAt", lit(null).cast(TimestampType))
      .withColumn("updatedAt", lit(null).cast(TimestampType))
    st.urls.createMany(urls)
    st.urls.update(graft.query.F.eq("id", "g1"), Map("status" -> lit(true)))
    val snap = st.urls.snapshot()
    assert(snap.filter($"status" <=> true).count() == 1)
    assert(snap.filter($"status".isNull).count() == 0)
  }

  test("prefix-sum sharding holds at 1M rows across 64 partitions, no window") {
    val n = 1000000L
    val df = spark.range(n).select($"id", (($"id" * 31) % 100 + 1).as("tok"))
    val out = Packing.assignShardsByTokenBudget(df, Seq($"id"), $"tok",
      budget = 1000000L, numPartitions = 64)
    // total volume and shard count line up exactly with the direct sum
    val total = df.agg(sum($"tok")).head().getLong(0)
    val stats = out.agg(max($"shard"), count(lit(1))).head()
    assert(stats.getLong(1) == n)
    assert(stats.getLong(0) == (total - 1) / 1000000L ||
      stats.getLong(0) == total / 1000000L)
    // the plan must not contain a window operator (single-reducer risk)
    assert(!out.queryExecution.executedPlan.toString.contains("Window ["),
      "prefix-sum sharding must not plan a window")
    // boundary exactness: first doc of shard 1 starts at or after budget
    val firstOfShard1 = out.filter($"shard" === 1L).agg(min($"id")).head().getLong(0)
    val before = df.filter($"id" < firstOfShard1).agg(sum($"tok")).head().getLong(0)
    assert(before >= 1000000L && before - 100 < 1000000L)
  }

  test("substring dedup stays linear under corpus-wide boilerplate") {
    // EVERY doc opens with the same 12-token header (the nav-block shape):
    // the header grams' ownership groups span the whole corpus, and the
    // marked set must stay O(docs), never docs² — this completes in
    // seconds only if no per-gram pair expansion exists
    val header = (0 until 12).map(i => s"nav$i").mkString(" ")
    val docs = spark.range(2000).select($"id".as("doc_id"),
      concat(lit(header + " "),
        concat_ws(" ", (0 until 10).map(j => concat(lit("b"), $"id", lit(s"_$j"))): _*))
        .as("text"))
    val t0 = System.nanoTime()
    val spans = SubstringDedup.dupSpans(docs, "doc_id", "text", k = 10)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"boilerplate marking not linear: ${secs}s")
    // doc 0 owns the header; all 1999 others carry exactly the [0, 11] span
    assert(spans.length == 1999)
    assert(spans.forall(r => r.getLong(1) == 0L && r.getLong(2) == 11L))
    assert(!spans.exists(r => r.getLong(0) == 0L), "owner doc must keep its header")
  }

  test("Misra-Gries survives a singleton flood: bounded buffers, heavies intact") {
    // 500k near-unique tokens + 3 planted heavies across 16 partitions:
    // the buffer must stay ≤k at every merge (an unbounded map here is a
    // per-task OOM at 100 TB vocabularies) and the heavies must be in
    // the candidate set by the N/(k+1) superset guarantee.
    val n = 500000L
    val toks = spark.range(n).select(
      when(pmod($"id", lit(50)) === 0, lit("heavy_a"))
        .when(pmod($"id", lit(50)) === 1, lit("heavy_b"))
        .when(pmod($"id", lit(50)) === 2, lit("heavy_c"))
        .otherwise(concat(lit("u"), $"id")).as("tok"))
      .repartition(16)
    val cands = toks.agg(
        graft.functions.MisraGries.heavyHitterCandidates($"tok", 256).as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 256, s"buffer leaked: ${cands.size} candidates")
    // each heavy is 2% of the stream ≫ N/257
    assert(Set("heavy_a", "heavy_b", "heavy_c").subsetOf(cands.toSet))

    // the bound must hold DURING the per-task add loop, not only after
    // the merge-time shrink: a raw buffer fed a singleton flood may
    // never exceed k live counters at any point (this is what keeps a
    // 100 TB-vocabulary task from OOMing; the final-size assertion above
    // passed even when add() leaked and only the merge trimmed)
    val buf = new graft.functions.MisraGriesBuffer(16)
    (0 until 10000).foreach { i =>
      buf.add(org.apache.spark.unsafe.types.UTF8String.fromString(s"s$i"))
      assert(buf.size <= 16, s"add leaked at $i: ${buf.size}")
    }
    // heavies still surface through a flood in the same buffer
    (0 until 200).foreach { _ =>
      buf.add(org.apache.spark.unsafe.types.UTF8String.fromString("H"))
    }
    assert(buf.contains(org.apache.spark.unsafe.types.UTF8String.fromString("H")))
  }
}
