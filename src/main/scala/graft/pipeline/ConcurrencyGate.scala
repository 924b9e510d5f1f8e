package graft.pipeline

import org.apache.spark.sql.{Dataset, Encoder}

/** Bounded-concurrency gate for external-I/O legs — the reference's
  * 10-permit browser semaphore (`services/browser.ts:21,69`), made
  * explicit instead of implicit in partition parallelism.
  *
  * Spark runs up to `spark.executor.cores` tasks per executor; without a
  * gate, an extractor calling an external service (browser pool, LLM
  * endpoint, CRM API) fires that many concurrent calls per executor. The
  * gate bounds concurrent calls with a named per-JVM fair semaphore:
  * permits guard the external resource each executor JVM owns. The
  * cluster-wide bound is `permits × executors` — a deliberate design
  * (each executor owns its own browser/HTTP pool, exactly like the
  * reference's per-process browser semaphore); a single global bound
  * would need an external rate limiter and would serialize the cluster
  * through one coordinator.
  */
object ConcurrencyGate {

  private val gates =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.Semaphore]()

  private def gate(name: String, permits: Int): java.util.concurrent.Semaphore =
    gates.computeIfAbsent(name, _ => new java.util.concurrent.Semaphore(permits, true))

  /** Run `f` holding one permit of the named gate (per-JVM). */
  def withPermit[A](name: String, permits: Int)(f: => A): A = {
    val g = gate(name, permits)
    g.acquire()
    try f finally g.release()
  }

  /** Permits currently held on this JVM (observability / test hook). */
  def inUse(name: String, permits: Int): Int = {
    val g = gate(name, permits)
    permits - g.availablePermits()
  }

  /** Gate a per-row external call inside `mapPartitions`: regardless of
    * how many tasks run concurrently, at most `permits` calls are in
    * flight per executor. This is the imperative boundary where a real
    * extractor leaves Spark (the `mapPartitions` exception the design
    * doc reserves for external I/O). */
  def gatedMap[T, U: Encoder](ds: Dataset[T], name: String, permits: Int)
                             (call: T => U): Dataset[U] =
    ds.mapPartitions { rows =>
      rows.map(t => withPermit(name, permits)(call(t)))
    }
}
