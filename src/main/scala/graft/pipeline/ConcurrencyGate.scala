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

  private final case class Gate(sem: java.util.concurrent.Semaphore, permits: Int)
  private val gates =
    new java.util.concurrent.ConcurrentHashMap[String, Gate]()

  /** A named gate's permit count is fixed by its FIRST use; a later call
    * with a different count is a programming error (silently honoring the
    * first count would un-throttle the caller that asked for less). */
  private def gate(name: String, permits: Int): Gate = {
    val g = gates.computeIfAbsent(name,
      _ => Gate(new java.util.concurrent.Semaphore(permits, true), permits))
    require(g.permits == permits,
      s"gate '$name' already exists with ${g.permits} permits (asked for $permits)")
    g
  }

  /** Run `f` holding one permit of the named gate (per-JVM). */
  def withPermit[A](name: String, permits: Int)(f: => A): A = {
    val g = gate(name, permits).sem
    g.acquire()
    try f finally g.release()
  }

  /** Permits currently held on this JVM (observability / test hook). */
  def inUse(name: String, permits: Int): Int = {
    val g = gate(name, permits)
    g.permits - g.sem.availablePermits()
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
