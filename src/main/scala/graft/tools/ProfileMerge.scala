package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Micro-profiler for the SMALL-delta MERGE path (r18 item 1): a 500-row
  * table takes ten 50-row upserts, ten tiny applyChanges batches, and ten
  * tiny updateMany/deleteMany pairs; per-phase wall time and job count
  * show what one tiny mutation costs on the current staging shape.
  * Dev tooling only. */
object ProfileMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftLogging.silenceKnownNoise()
    import spark.implicits._
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    })
    def time[A](label: String)(f: => A): A = {
      Thread.sleep(60)
      val j0 = jobs
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(60)
      println(f"[phase] $label%-32s ${dt}%6.3f s  jobs=${jobs - j0}")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val root = java.nio.file.Files.createTempDirectory("prof-merge").toString
      val cat = new graft.store.Catalog(root)
      val t = new graft.store.GraftTable(spark, cat, "kv", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType, nullable = true))),
        uniqueKeys = Seq(Seq("id")))
      time("createMany 500") {
        t.createMany((1L to 500L).map(i => (i, s"v$i")).toDF("id", "v"))
      }
      time("10x upsert 50 rows") {
        (1 to 10).foreach { r =>
          t.upsert(Seq("id"),
            (1L to 50L).map(i => (i + r, s"u$r-$i")).toDF("id", "v"))
        }
      }
      time("10x updateMany (~45 rows)") {
        (1 to 10).foreach { r =>
          t.updateMany(graft.query.RawCol(pmod(col("id"), lit(11)) === r),
            Map("v" -> lit(s"m$r")))
        }
      }
      time("10x deleteMany (~5 rows)") {
        (1 to 10).foreach { r =>
          t.deleteMany(graft.query.RawCol(col("id") === 490L + r))
        }
      }
      // applyChanges: mirror drains tiny CDC batches
      val mir = new graft.store.GraftTable(spark, cat, "mir", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType, nullable = true))),
        uniqueKeys = Seq(Seq("id")))
      time("10x applyChanges 20 rows") {
        (1 to 10).foreach { r =>
          val ch = ((1L to 15L).map(i => (i + 20 * r, s"c$r-$i", "insert")) ++
            (1L to 5L).map(i => (i + 20 * (r - 1), null: String, "delete")))
            .toDF("id", "v", "_change_type")
          val txn = new graft.store.Txn(cat)
          txn.applyChanges(mir, ch)
          txn.commit()
        }
      }
      println(s"final counts: kv=${t.snapshot().count()} mir=${mir.snapshot().count()}")
    }
    spark.stop()
  }
}
