package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock profiler for one or more SparkEntry gates: prints
  * every Spark job's duration + call site, plus the total driver-side gap
  * (time between jobs — Catalyst planning, codegen, manifest IO, catalog
  * work). The lifecycle gates (store/streaming/index) are sequences of
  * dozens of small actions; this tool says which actions and which gaps
  * actually cost, so optimization goes where the time is. Dev tooling only.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
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

    case class J(id: Int, site: String, start: Long, var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          // result stage's name carries the action call site when the
          // submitting thread set no callSite property
          .orElse(j.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        val rec = J(j.jobId, site, j.time)
        jobs.put(j.jobId, rec); order.add(rec); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId); if (r != null) r.end = e.time
      }
    })

    def run(name: String): Unit = {
      jobs.clear(); order.clear()
      val t0 = System.currentTimeMillis()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.currentTimeMillis() - t0) / 1e3
      Thread.sleep(700) // drain listener bus
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
      val jobSum = js.map(j => j.end - j.start).sum / 1e3
      println(f"== $name: wall=$wall%.2fs jobs=${js.size} jobTime=$jobSum%.2fs driverGap=${wall - jobSum}%.2fs")
      // aggregate by call site
      js.groupBy(_.site).toSeq
        .map { case (s, g) => (g.map(j => j.end - j.start).sum / 1e3, g.size, s) }
        .sortBy(-_._1).take(25)
        .foreach { case (t, n, s) => println(f"   $t%7.3fs  n=$n%-4d $s") }
      // largest gaps between consecutive jobs (driver work)
      if (js.nonEmpty) {
        val gaps = (js.sliding(2).collect {
          case Seq(a, b) if b.start > a.end => (b.start - a.end, a.site, b.site)
        }).toSeq.sortBy(-_._1).take(12)
        gaps.foreach { case (g, a, b) =>
          println(f"   gap ${g / 1e3}%7.3fs  after $a -> before $b")
        }
      }
    }
    // second pass for the gates: first run pays codegen/JIT, second shows
    // the steady-state split the bench's best-of-2 actually reports
    names.foreach(run)
    println("---- second pass ----")
    names.foreach(run)
    spark.stop()
  }
}
