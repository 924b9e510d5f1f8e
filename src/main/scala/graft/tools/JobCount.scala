package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Structural profiler: runs one SparkEntry query and prints how many jobs
  * / stages / tasks it schedules — the fixed-overhead metric that dominates
  * small-action paths (the store write surface) regardless of data size. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val verbose = sys.env.contains("JOBCOUNT_VERBOSE")
    @volatile var execs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              if s.rootExecutionId.forall(_ == s.executionId) =>
            execs += 1
            if (verbose) println(s"  exec ${s.executionId}: ${s.description.linesIterator.next()}")
          case _ => ()
        }
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    names.foreach { name =>
      jobs = 0; stages = 0; tasks = 0; execs = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      println(f"$name%s: execs=$execs jobs=$jobs stages=$stages tasks=$tasks time=$dt%.2fs")
    }
    spark.stop()
  }
}
