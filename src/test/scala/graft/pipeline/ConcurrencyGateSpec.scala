package graft.pipeline

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

object ConcurrencyGateSpec {
  // executor-side trackers (local mode: same JVM)
  val active = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The explicit extractor-boundary concurrency gate
  * (services/browser.ts:21 semaphore-of-10 analog). */
class ConcurrencyGateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("gatedMap bounds in-flight external calls below task parallelism") {
    import ConcurrencyGateSpec._
    active.set(0); maxActive.set(0)
    val permits = 4
    val ds = spark.range(64).repartition(32).as[Long]
    val out = ConcurrencyGate.gatedMap(ds, "spec-gate", permits) { i =>
      val now = active.incrementAndGet()
      maxActive.updateAndGet(m => math.max(m, now))
      Thread.sleep(20) // hold the permit while 32 tasks contend
      active.decrementAndGet()
      i * 2
    }.collect()
    assert(out.sorted.toSeq == (0L until 64L).map(_ * 2))
    assert(maxActive.get() <= permits,
      s"gate leaked: ${maxActive.get()} concurrent calls > $permits permits")
    assert(maxActive.get() >= 2, "expected some concurrency under the gate")
    assert(ConcurrencyGate.inUse("spec-gate", permits) == 0, "permits returned")
  }

  test("withPermit releases on failure") {
    intercept[RuntimeException] {
      ConcurrencyGate.withPermit("spec-gate-2", 1)(throw new RuntimeException("boom"))
    }
    assert(ConcurrencyGate.inUse("spec-gate-2", 1) == 0)
  }
}
