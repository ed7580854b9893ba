package graft.observe

import java.io.IOException
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicBoolean

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.slf4j.LoggerFactory

/** Health/readiness HTTP endpoints — SURVEY §2 op 15, parity with the
  * reference's `HealthServer` (flink-job/.../HealthServer.java:46-68 start
  * semantics, :73-78 stop, :91-97 handler):
  *
  *  - `GET /health` and `GET /readiness` both answer `200` with body
  *    `{"status":"UP"}` and `Content-Type: application/json` — the probe
  *    targets `k8s/deployment.yml` hits on every deploy.
  *  - JDK built-in [[HttpServer]], zero extra dependencies; requests are
  *    served by one daemon thread named `health-server`, so the server
  *    never blocks JVM exit.
  *  - `start` validates the port range like HealthServer.java:47-50 and,
  *    like the reference, logs (rather than throws) a bind failure —
  *    a health endpoint must never take down the job it reports on.
  *  - `stop` is idempotent (compareAndSet guard, :74).
  *
  * When constructed with a `metrics` supplier, `GET /metrics` additionally
  * serves the [[SentinelQueryListener]] snapshot in Prometheus text
  * exposition format (version 0.0.4) — the reference registers the same
  * counters/histogram with Flink's metric registry for its Prometheus
  * reporter (SentinelMetrics.java:29-51; README.md:279-281); in Spark the
  * listener owns the numbers and this handler is the scrape surface.
  * Metric names match the reference's group and metric ids
  * (`stream_sentinel_events_processed_total`,
  * `stream_sentinel_anomalies_detected_total`,
  * `stream_sentinel_processing_latency_ms{quantile=…}`).
  *
  * Driver-side infra: this runs next to the `SparkSession`, not inside
  * executors, so cluster scale-up doesn't touch it (a scrape reads a few
  * longs under one lock, never a Spark plan).
  */
final class HealthServer(metrics: Option[() => LatencyStats] = None) {

  private val log = LoggerFactory.getLogger(classOf[HealthServer])
  private val body = "{\"status\":\"UP\"}".getBytes(StandardCharsets.UTF_8)
  private val running = new AtomicBoolean(false)
  @volatile private var server: HttpServer = _
  @volatile private var metricsExec: java.util.concurrent.ExecutorService = _

  /** Start on `port`; must be in [1, 65535]. */
  def start(port: Int): Unit = {
    if (port < 1 || port > 65535)
      throw new IllegalArgumentException(
        s"Health port must be in range [1, 65535], got: $port")
    try {
      server = HttpServer.create(new InetSocketAddress(port), 0)
      server.createContext("/health", handle(_))
      server.createContext("/readiness", handle(_))
      // /metrics runs on its OWN thread: the scrape takes the listener's
      // stats lock (contended by streaming progress callbacks), and the
      // class invariant is that a slow scrape must never delay a K8s
      // liveness/readiness answer. The handler hops executors and returns;
      // the exchange completes when the metrics thread closes the body.
      metrics.foreach { m =>
        metricsExec = Executors.newSingleThreadExecutor { r =>
          val t = new Thread(r, "health-metrics")
          t.setDaemon(true)
          t
        }
        server.createContext("/metrics",
          ex => metricsExec.execute(() => handleMetrics(m, ex)))
      }
      server.setExecutor(Executors.newSingleThreadExecutor { r =>
        val t = new Thread(r, "health-server")
        t.setDaemon(true)
        t
      })
      server.start()
      running.set(true)
      log.info("Health server started on port {}", port)
    } catch {
      case e: IOException =>
        log.error(s"Failed to start health server on port $port: ${e.getMessage}", e)
    }
  }

  /** Stop gracefully; safe to call twice or before a successful start. */
  def stop(): Unit =
    if (server != null && running.compareAndSet(true, false)) {
      server.stop(0)
      if (metricsExec != null) metricsExec.shutdownNow()
      log.info("Health server stopped")
    }

  def isRunning: Boolean = running.get()

  private def handle(exchange: HttpExchange): Unit = {
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(200, body.length.toLong)
    val os = exchange.getResponseBody
    try os.write(body)
    finally os.close()
  }

  /** Prometheus text exposition 0.0.4 of the listener snapshot. Counters
    * are cumulative (monotone across scrapes by [[SentinelQueryListener]]
    * construction); the latency histogram surfaces as a summary with the
    * reference's p50/p95/p99 readings over its 350-sample window.
    * Runs on the dedicated `health-metrics` thread (never the probe
    * thread); a throwing supplier answers 500 instead of leaking the
    * exchange. */
  private def handleMetrics(m: () => LatencyStats, exchange: HttpExchange): Unit = {
    val s = try m() catch {
      case e: Throwable =>
        log.error(s"metrics snapshot failed: ${e.getMessage}", e)
        exchange.sendResponseHeaders(500, -1L)
        exchange.close()
        return
    }
    val g = Metrics.metricGroup
    val text =
      s"""# HELP ${g}_events_processed_total Events evaluated across all micro-batches.
         |# TYPE ${g}_events_processed_total counter
         |${g}_events_processed_total ${s.rows}
         |# HELP ${g}_anomalies_detected_total Alerts fired.
         |# TYPE ${g}_anomalies_detected_total counter
         |${g}_anomalies_detected_total ${s.anomalies}
         |# HELP ${g}_batches_total Micro-batches executed.
         |# TYPE ${g}_batches_total counter
         |${g}_batches_total ${s.batches}
         |# HELP ${g}_processing_latency_ms Micro-batch triggerExecution latency over the retained sample window.
         |# TYPE ${g}_processing_latency_ms summary
         |${g}_processing_latency_ms{quantile="0.5"} ${s.p50Ms}
         |${g}_processing_latency_ms{quantile="0.95"} ${s.p95Ms}
         |${g}_processing_latency_ms{quantile="0.99"} ${s.p99Ms}
         |""".stripMargin.getBytes(StandardCharsets.UTF_8)
    exchange.getResponseHeaders.set("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    exchange.sendResponseHeaders(200, text.length.toLong)
    val os = exchange.getResponseBody
    try os.write(text)
    finally os.close()
  }
}
