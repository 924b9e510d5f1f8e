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

  /** Carries the underlying failure (if the timeout surfaced by killing a
    * job mid-flight) as the cause — a genuine data error racing the
    * deadline must stay debuggable, not be flattened into "timeout". */
  final class StageTimeoutException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  def withTimeout[A](spark: SparkSession, timeoutMs: Long,
                     group: String = s"graft-timeout-${System.nanoTime()}")(body: => A): A = {
    val sc = spark.sparkContext
    @volatile var timedOut = false
    // armed gate: interrupt() in finally only helps while the watchdog is
    // still sleeping — one that already woke would cancel the job GROUP
    // after this invocation finished, killing an unrelated later stage
    // that reuses the group name. Check-then-cancel and the finally's
    // disarm are mutually exclusive under ONE lock: either the disarm ran
    // first (cancel is skipped) or the cancel completes BEFORE the finally
    // can proceed — a stale cancel can never land after this invocation
    // returned, even with an explicitly reused group name.
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val watchdog = new Thread(() => {
      try {
        Thread.sleep(timeoutMs)
        armed.synchronized {
          if (armed.get()) {
            timedOut = true
            sc.cancelJobGroup(group)
          }
        }
      } catch { case _: InterruptedException => () }
    }, s"$group-watchdog")
    watchdog.setDaemon(true)
    // job-group assignment is a thread-local Spark property — save the
    // caller's and RESTORE it (clearJobGroup would detach all later jobs
    // from an enclosing group, silently breaking the outer watchdog /
    // the caller's own cancelJobGroup; nested withTimeout needs this)
    val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(group, s"graft stage (timeout ${timeoutMs}ms)",
      interruptOnCancel = true)
    watchdog.start()
    try {
      val out = body
      if (timedOut) throw new StageTimeoutException(s"stage exceeded ${timeoutMs}ms")
      out
    } catch {
      case e: Throwable if timedOut =>
        throw new StageTimeoutException(
          s"stage exceeded ${timeoutMs}ms (${e.getClass.getSimpleName})", e)
    } finally {
      // synchronized disarm: blocks while an in-flight check-then-cancel
      // holds the lock, so the job-group restore below (and everything
      // after this call) runs strictly after any cancel this watchdog
      // will ever issue
      armed.synchronized { armed.set(false) }
      watchdog.interrupt()
      sc.setLocalProperty("spark.jobGroup.id", prevGroup)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
    }
  }
}
