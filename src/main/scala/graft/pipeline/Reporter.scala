package graft.pipeline

import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.jdk.CollectionConverters._

/** Periodic background metrics reporter — the reference dumps its counters
  * on a fixed schedule (`runner/locator.ts:210-226`, `Schedule.spaced`
  * 60 s / 30 s) independent of the work loop. Gauges register as thunks;
  * a daemon thread samples every gauge each `intervalMs` and appends one
  * report row per gauge. Report rows stay in a bounded in-memory buffer
  * and optionally flow to `onReport` (log line, metrics sink, …). */
final class MetricsReporter(intervalMs: Long,
                            onReport: MetricsReporter.Report => Unit = _ => (),
                            maxBuffered: Int = 10000) {
  import MetricsReporter.Report
  private val gauges =
    new java.util.concurrent.ConcurrentHashMap[String, () => Long]()
  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Report]()
  @volatile private var running = false
  private var thread: Option[Thread] = None

  def register(name: String)(f: => Long): Unit = gauges.put(name, () => f)

  /** All report rows emitted so far (oldest first). */
  def reports: Seq[Report] = buf.iterator().asScala.toSeq

  /** Gauge sample failures since start — a throwing gauge (ANY throwable,
    * including a gauge-raised InterruptedException) is skipped for that
    * tick, counted here, and never kills the reporter thread; only
    * [[stop]] ends the loop (it flips `running` before interrupting). */
  val sampleFailures = new java.util.concurrent.atomic.AtomicLong(0)
  private val buffered = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Sample every registered gauge once (also called by the timer). */
  def sampleNow(): Unit = {
    val t = System.currentTimeMillis()
    gauges.forEach { (name, f) =>
      try {
        val r = Report(t, name, f())
        buf.add(r)
        // O(1) bound bookkeeping (ConcurrentLinkedQueue.size is O(n))
        if (buffered.incrementAndGet() > maxBuffered) { buf.poll(); buffered.decrementAndGet() }
        onReport(r)
      } catch {
        case _: Throwable => sampleFailures.incrementAndGet()
      }
    }
  }

  def start(): Unit = synchronized {
    if (!running) {
      running = true
      val th = new Thread(() => {
        // sampleNow swallows all gauge failures; the only interrupt that
        // reaches this catch is stop()'s (delivered in Thread.sleep)
        try while (running) { Thread.sleep(intervalMs); if (running) sampleNow() }
        catch { case _: InterruptedException => () }
      }, s"graft-metrics-reporter-${intervalMs}ms")
      th.setDaemon(true)
      th.start()
      thread = Some(th)
    }
  }

  def stop(): Unit = synchronized {
    running = false
    thread.foreach(_.interrupt())
    thread = None
  }
}

object MetricsReporter {
  final case class Report(atMs: Long, name: String, value: Long)
}

/** Trigger-boundary reporter for streaming stages: a
  * `StreamingQueryListener` that captures each micro-batch's progress —
  * input rows plus any `Dataset.observe` metrics riding the stream — into
  * a thread-safe buffer. The streaming-native form of the reference's
  * periodic report: one row set per trigger instead of per wall-clock
  * interval. Register via `spark.streams.addListener`. */
final class ObservedMetricsListener(maxBuffered: Int = 10000)
    extends StreamingQueryListener {
  import ObservedMetricsListener.BatchMetrics
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[BatchMetrics]()
  private val buffered = new java.util.concurrent.atomic.AtomicInteger(0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val observed = p.observedMetrics.asScala.toSeq.flatMap { case (obsName, row) =>
      row.schema.fieldNames.zipWithIndex.toSeq.collect {
        case (f, i) if row.get(i) != null && row.get(i).isInstanceOf[Number] =>
          s"$obsName.$f" -> row.get(i).asInstanceOf[Number].longValue()
      }
    }.toMap
    buf.add(BatchMetrics(p.batchId, p.numInputRows, observed))
    // bounded (O(1) counter — this runs on the shared listener-bus thread)
    if (buffered.incrementAndGet() > maxBuffered) { buf.poll(); buffered.decrementAndGet() }
  }

  /** One entry per completed micro-batch, oldest first. */
  def batches: Seq[BatchMetrics] = buf.iterator().asScala.toSeq
}

object ObservedMetricsListener {
  final case class BatchMetrics(batchId: Long, numInputRows: Long,
                                observed: Map[String, Long])
}
