package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Phase-level profiler for the store/streaming lifecycle gates: re-runs
  * each gate's body with a timer + job counter around every phase, so the
  * job-count budget of each store operation is visible. Dev tooling only. */
object ProfileStores {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftLogging.silenceKnownNoise()
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })
    def time[A](label: String)(f: => A): A = {
      Thread.sleep(80)
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(80)
      println(f"[phase] $label%-42s ${dt}%6.2f s  jobs=${jobs - j0}")
      r
    }
    def tempDir(prefix: String): String = {
      val d = java.nio.file.Files.createTempDirectory(prefix)
      d.toFile.deleteOnExit()
      d.toString
    }

    args.foreach {
      case "ann" => (1 to 2).foreach { pass =>
        println(s"--- q_stream_ann body, pass $pass ---")
        val tmp = tempDir("prof-ann")
        val cat = new graft.store.Catalog(tmp + "/cat")
        val emb = graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val src = new graft.store.GraftTable(spark, cat, "vecs", StructType(Seq(
          StructField("vec_id", LongType, nullable = false),
          StructField("embedding", ArrayType(FloatType), nullable = true))),
          uniqueKeys = Seq(Seq("vec_id")))
        time("createMany 3/4")(
          src.createMany(emb.filter(pmod(col("vec_id"), lit(4)) =!= 0)))
        val idx = time("AnnIndex.build")(
          graft.store.AnnIndex.build(src, "e1", "embedding", "vec_id",
            nCells = 4, m = 4, k = 8, iters = 2))
        val embSchema = graft.Tables.embeddings(spark, sfDir).schema
        val appendSink = graft.streaming.StoreSink.exactlyOnceAppend(src, "ingest")
        val sinkAndRefresh: (DataFrame, Long) => Unit = (df, batchId) => {
          time("  batch: appendSink")(
            appendSink(df.filter(pmod(col("vec_id"), lit(4)) === 0)
              .select(col("vec_id"), col("embedding")), batchId))
          time("  batch: idx.refresh")(idx.refresh())
          ()
        }
        val q = time("stream drain") {
          val q0 = spark.readStream.schema(embSchema)
            .parquet(s"$sfDir/embeddings.parque[t]")
            .writeStream.foreachBatch(sinkAndRefresh)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", tmp + "/ckpt").start()
          q0.awaitTermination(180000); q0
        }
        time("require store count")(
          require(src.snapshot().count() == emb.count()))
        time("require codes distinct")(
          require(idx.codes.snapshot().select(col("id")).distinct().count()
            == emb.count()))
        val cur = idx.currentThrough()
        time("replay batch")(
          sinkAndRefresh(graft.Tables.embeddings(spark, sfDir), 0L))
        require(idx.currentThrough() == cur)
        val queries = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding"))
        time("search + noop")(
          graft.store.AnnIndex.open(src, "e1", "embedding", "vec_id")
            .search(queries, "qid", nProbe = 2, topk = 5)
            .orderBy(col("qid"), col("rank"))
            .write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      case "bm25" => (1 to 2).foreach { pass =>
        println(s"--- q_stream_bm25 body, pass $pass ---")
        val tmp = tempDir("prof-bm25")
        val cat = new graft.store.Catalog(tmp + "/cat")
        val src = new graft.store.GraftTable(spark, cat, "docs", StructType(Seq(
          StructField("doc_id", LongType, nullable = false),
          StructField("text", StringType, nullable = true))),
          uniqueKeys = Seq(Seq("doc_id")))
        val idx = time("Bm25Index.build (empty)")(
          graft.store.Bm25Index.build(src, "r1", "text", "doc_id", nBuckets = 4))
        val docSchema = graft.Tables.documents(spark, sfDir).schema
        val appendSink = graft.streaming.StoreSink.exactlyOnceAppend(src, "ingest")
        val sinkAndRefresh: (DataFrame, Long) => Unit = (df, batchId) => {
          time("  batch: appendSink")(appendSink(df, batchId))
          time("  batch: idx.refresh")(idx.refresh())
          ()
        }
        time("stream drain") {
          val q = spark.readStream.schema(docSchema)
            .parquet(s"$sfDir/documents.parque[t]")
            .select(col("doc_id"), col("text"))
            .writeStream.foreachBatch(sinkAndRefresh)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", tmp + "/ckpt").start()
          q.awaitTermination(180000)
        }
        val docs = graft.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        time("require N")(require(idx.stats()._1 == docs.count()))
        val cur = idx.currentThrough()
        time("replay batch")(sinkAndRefresh(docs, 0L))
        require(idx.currentThrough() == cur)
        time("search + noop")(
          graft.store.Bm25Index.open(src, "r1", "text", "doc_id")
            .search(Seq("vector", "stream", "window"))
            .orderBy(col("doc_id"))
            .write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      case "cdf" => (1 to 2).foreach { pass =>
        println(s"--- q_cdf_tail body, pass $pass ---")
        val cat = new graft.store.Catalog(tempDir("prof-cdftail"))
        def tbl(n: String) = new graft.store.GraftTable(spark, cat, n,
          StructType(Seq(
            StructField("id", LongType, nullable = false),
            StructField("name", StringType, nullable = true),
            StructField("acctbal", DoubleType, nullable = true))),
          uniqueKeys = Seq(Seq("id")))
        val src = tbl("cust")
        val mir = tbl("mirror")
        def cust(lo: Long, hi: Long) = graft.Tables.customer(spark, sfDir)
          .filter(col("c_custkey") >= lo && col("c_custkey") <= hi)
          .select(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_acctbal").as("acctbal"))
        def drain(tag: String): Unit = time(s"  drain $tag")(
          graft.store.CdfTail.drainAll(src, "mirror") {
            (txn, ch, _, _) => txn.applyChanges(mir, ch); ()
          })
        time("createMany 0..200")(src.createMany(cust(0, 200)))
        drain("1 (initial inserts)")
        time("updateMany")(src.updateMany(
          graft.query.RawCol(col("id") <= 100L), Map("acctbal" -> lit(0.0))))
        time("deleteMany")(src.deleteMany(graft.query.RawCol(col("id") > 150L)))
        drain("2 (upd+del)")
        time("createMany 201..210")(src.createMany(cust(201, 210)))
        drain("3 (late inserts)")
        time("caught-up drainOnce")(require(graft.store.CdfTail
          .drainOnce(src, "mirror")((_, _, _, _) => ()).isEmpty))
        time("final snapshot + noop")(
          mir.snapshot().select(col("id"), col("name"), col("acctbal"))
            .orderBy(col("id"))
            .write.format("noop").mode("overwrite").save())
        spark.catalog.clearCache()
      }
      case "clusters" => (1 to 2).foreach { pass =>
        println(s"--- q_dup_clusters_dist body, pass $pass ---")
        val docs = graft.Tables.documents(spark, sfDir)
          .filter(pmod(col("doc_id"), lit(8)) === 0)
          .select(col("doc_id"), col("text"))
        val c1 = docs.select((col("doc_id") + 10000L).as("doc_id"), col("text"))
        val c2 = docs.select((col("doc_id") + 20000L).as("doc_id"), col("text"))
        val all = c1.unionByName(c2).unionByName(docs).repartition(32)
        val diff = col("id_b") - col("id_a")
        val pairs = graft.operators.Dedup.minhashLshPairs(all, "text", "doc_id",
            threshold = 0.7)
          .filter(diff === 10000L || diff === 20000L)
        val mat = time("LSH pairs + checkpoint")(pairs.localCheckpoint())
        val m = time("dupClustersManaged loop")(
          graft.operators.Dedup.dupClustersManaged(mat, smallGraphEdges = 0L))
        time("materialize labels")(
          m.df.write.format("noop").mode("overwrite").save())
        m.release()
        spark.catalog.clearCache()
      }
      case other => println(s"unknown profile target: $other")
    }
    spark.stop()
  }
}
