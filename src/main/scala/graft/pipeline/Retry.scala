package graft.pipeline

import graft.store.ConcurrentModificationException

/** Retry schedules (SURVEY §2.F): the reference retries activities 1-3×
  * with exponential backoff (`extractGooglePlaces.ts:31-45,358`,
  * `syncCrm.ts:171`). In the engine the retryable failure is an optimistic
  * concurrency conflict on commit — another writer moved a table between
  * our snapshot and our manifest swap — which a fresh attempt (re-reading
  * the new state) resolves. */
object Retry {

  /** Exponential backoff on OCC conflicts; rethrows after `times`.
    *
    * The backoff is CAPPED at `capMs`: uncapped doubling with a
    * double-digit retry budget schedules multi-minute (at times=20,
    * multi-HOUR) sleeps — against a steady competing committer that is
    * indistinguishable from a hang, and it parks the loser long past the
    * point where the conflict it is waiting out has resolved. An OCC
    * conflict window is one commit long; once the backoff exceeds a few
    * commit durations, more sleep buys nothing but latency (this
    * livelocked the concurrent-compaction gate at sf1, where commits
    * take ~1 s: the writer lost a few races, then slept for minutes
    * while the compactor kept publishing). */
  def onConflict[A](times: Int = 3, baseMs: Long = 50,
                    capMs: Long = 250)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: ConcurrentModificationException =>
          attempt += 1
          if (attempt > times) throw e
          Thread.sleep(math.min(baseMs << math.min(attempt - 1, 20), capMs))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Generic bounded retry with exponential backoff for external-I/O legs
    * (the browser/LLM/CRM boundary in a production deployment). Only
    * NonFatal failures are ever retried: retrying an InterruptedException
    * would swallow cooperative cancellation and sleep through the whole
    * backoff schedule with the interrupt flag lost, and retrying
    * OutOfMemoryError/fatal VM errors masks a dying JVM. */
  def withBackoff[A](times: Int, baseMs: Long = 100,
                     retryable: Throwable => Boolean = _ => true)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt() // re-assert; never retried
          throw e
        case scala.util.control.NonFatal(e) if retryable(e) && attempt < times =>
          attempt += 1
          Thread.sleep(baseMs * (1L << (attempt - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
