package graft.observe

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Latency/throughput snapshot over the retained batch samples. */
final case class LatencyStats(batches: Long, rows: Long, anomalies: Long,
    p50Ms: Double, p95Ms: Double, p99Ms: Double)

/** Streaming metrics listener — the Spark-native analog of the reference's
  * SentinelMetrics (flink-job/.../SentinelMetrics.java:29-51): counters
  * plus a bounded-sample latency histogram with p50/p95/p99. The reference
  * keeps a 350-sample sliding histogram of PER-EVENT process latency
  * (:37-38); in the micro-batch model the unit of execution is the batch,
  * so the histogram samples are per-batch `triggerExecution` durations
  * (per-row wall-clocking would defeat whole-stage codegen), and counters
  * come from `numInputRows` plus any [[Metrics]] `observe()` values
  * surfaced in `progress.observedMetrics`.
  *
  * Thread-safety: progress events arrive on the listener bus thread;
  * readers call [[snapshot]] from anywhere — all state is behind one lock
  * (tiny: <= sampleWindow longs).
  */
final class SentinelQueryListener(sampleWindow: Int = 350)
    extends StreamingQueryListener {
  require(sampleWindow > 0)

  private[this] val lock = new Object
  private[this] val durations = new scala.collection.mutable.ArrayDeque[Long]
  private[this] var batches = 0L
  private[this] var rows = 0L
  private[this] var anomalies = 0L

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = lock.synchronized {
    val p = event.progress
    batches += 1
    rows += p.numInputRows
    val d = p.durationMs.getOrDefault("triggerExecution", 0L)
    durations.append(d)
    if (durations.size > sampleWindow) durations.removeHead() // 350-sample slide (:37)
    // anomalies_detected_total from the observe() side-channel, when the
    // query's plan carries Metrics.observeAlerts
    val om = p.observedMetrics
    if (om.containsKey(s"${Metrics.metricGroup}_alerts")) {
      val row = om.get(s"${Metrics.metricGroup}_alerts")
      anomalies += row.getAs[Long]("anomalies_detected_total")
    }
  }

  /** Nearest-rank percentile over the retained samples (the same reading
    * a DescriptiveStatistics histogram gives on small n). */
  private def pct(sorted: IndexedSeq[Long], p: Double): Double =
    if (sorted.isEmpty) 0.0
    else sorted(math.min(sorted.size - 1,
      math.max(0, math.ceil(p / 100.0 * sorted.size).toInt - 1))).toDouble

  def snapshot: LatencyStats = lock.synchronized {
    val s = durations.toIndexedSeq.sorted
    LatencyStats(batches, rows, anomalies,
      pct(s, 50), pct(s, 95), pct(s, 99))
  }
}
