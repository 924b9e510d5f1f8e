package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_near_dup_audit superlinear scaling (round-10
  * verdict item 1). Times each stage of the portable MinHash-LSH pipeline
  * separately at the given SF dir. Dev tooling, not part of the library
  * surface.
  */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir).repartition(32)

    // Stage 1: signatures only (md5 family, kernel path)
    val numHashes = 32; val b = 16; val rows = 2; val k = 3
    val withSig = docs
      .select(col("doc_id").as("__id"),
        array_distinct(graft.operators.Dedup.shingles(col("text"), k)).as("__sh"))
      .withColumn("__sig",
        graft.functions.SketchExpressions.md5MinhashSignature(col("__sh"), numHashes))
    time("signatures (count)") { withSig.write.format("noop").mode("overwrite").save() }

    val banded = withSig.select(col("__id"), col("__sh"),
      posexplode(array((0 until b).map(j =>
        md5(concat_ws(":", (0 until rows).map(r0 =>
          element_at(col("__sig"), j * rows + r0 + 1).cast("string")): _*))): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bh")
    time("banded (noop)") { banded.write.format("noop").mode("overwrite").save() }

    val left = banded.select(col("__band"), col("__bh"),
      col("__id").as("id_a"), col("__sh").as("sh_a"))
    val right = banded.select(col("__band"), col("__bh"),
      col("__id").as("id_b"), col("__sh").as("sh_b"))
    val joined = left.hint("merge").join(right, Seq("__band", "__bh"))
      .filter(col("id_a") < col("id_b"))
    val nCand = time("candidate join (count)") { joined.count() }
    println(s"[profile] candidate collision rows: $nCand")
    val nPairs = time("distinct pairs (count)") {
      joined.select("id_a", "id_b").distinct().count()
    }
    println(s"[profile] distinct candidate pairs: $nPairs")

    val full = graft.operators.Dedup.minhashLshPairsPortable(
      docs, "text", "doc_id", threshold = 0.7)
    time("full pipeline (noop)") { full.write.format("noop").mode("overwrite").save() }

    // bucket audit at the production banding/guard defaults: how many
    // (band, hash) buckets exceed maxBucket, and how wide is the widest
    val audit = graft.operators.Dedup.minhashBucketAudit(
      docs, "text", "doc_id", threshold = 0.7, maxBucket = 1000)
    val stats = audit.agg(count(lit(1)).as("over_width_buckets"),
      max(col("width")).as("max_width"), sum(col("cells")).as("total_cells")).collect()(0)
    println(s"[profile] bucketAudit(maxBucket=1000): " +
      s"over=${stats.get(0)} maxWidth=${stats.get(1)} cells=${stats.get(2)}")
    spark.stop()
  }
}
