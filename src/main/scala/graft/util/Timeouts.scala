package graft.util

import org.apache.spark.sql.SparkSession

/** Per-unit timeouts (SURVEY §2.F): the reference bounds each workflow
  * execution at 60/5/3 minutes (`runner/locator.ts:112`,
  * `websiteScraper.ts:136`, `syncCrm.ts:132`). The Spark analog bounds a
  * stage run: the body executes under a job group and a watchdog cancels
  * every job in the group at the deadline — running tasks are interrupted,
  * the driver gets a [[StageTimeoutException]], and (because the store is
  * copy-on-write) nothing was published, which is exactly the reference's
  * null-on-timeout status semantics (`locator.ts:113-143`). */
object Timeouts {

  final class StageTimeoutException(msg: String) extends RuntimeException(msg)

  def withTimeout[A](spark: SparkSession, timeoutMs: Long,
                     group: String = s"graft-timeout-${System.nanoTime()}")(body: => A): A = {
    val sc = spark.sparkContext
    @volatile var timedOut = false
    val watchdog = new Thread(() => {
      try {
        Thread.sleep(timeoutMs)
        timedOut = true
        sc.cancelJobGroup(group)
      } catch { case _: InterruptedException => () }
    }, s"$group-watchdog")
    watchdog.setDaemon(true)
    sc.setJobGroup(group, s"graft stage (timeout ${timeoutMs}ms)",
      interruptOnCancel = true)
    watchdog.start()
    try {
      val out = body
      if (timedOut) throw new StageTimeoutException(s"stage exceeded ${timeoutMs}ms")
      out
    } catch {
      case e: Throwable if timedOut =>
        throw new StageTimeoutException(s"stage exceeded ${timeoutMs}ms (${e.getClass.getSimpleName})")
    } finally {
      watchdog.interrupt()
      sc.clearJobGroup()
    }
  }
}
