package graft.observe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Observability side-channel mirroring the reference's SentinelMetrics
  * (flink-job/.../SentinelMetrics.java:29-51: counters
  * `events_processed_total` / `anomalies_detected_total`, updated inside
  * the process function at AnomalyProcessFunction.java:128,140-142).
  *
  * Spark-native shape: `observe()` named metrics evaluated inside the
  * existing plan (zero extra pass, zero shuffle). Batch: read via
  * `df.observe`'s QueryExecutionListener or `Observation`; streaming: the
  * same named observation surfaces in `StreamingQueryProgress
  * .observedMetrics` — attach a `StreamingQueryListener` for scraping.
  * Per-event latency (the reference's 350-sample histogram) maps to the
  * streaming progress's `durationMs`/`numInputRows` rather than a
  * per-row clock — per-row wall-clock instrumentation would defeat
  * whole-stage codegen. */
object Metrics {

  val metricGroup = "stream_sentinel"

  /** Attach the counters to an event DataFrame (pre-detection). */
  def observeEvents(df: DataFrame): DataFrame =
    df.observe(s"${metricGroup}_events",
      count(lit(1)).as("events_processed_total"))

  /** Attach the counters to an alert DataFrame (post-detection). */
  def observeAlerts(df: DataFrame): DataFrame =
    df.observe(s"${metricGroup}_alerts",
      count(lit(1)).as("anomalies_detected_total"),
      approx_count_distinct(col("key")).as("distinct_keys_alerting"))
}
