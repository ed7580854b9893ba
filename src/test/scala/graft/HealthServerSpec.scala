package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.observe.HealthServer
import org.scalatest.funsuite.AnyFunSuite

/** §2 op 15 — probe-endpoint parity with the reference HealthServer
  * (HealthServer.java:46-68, :91-97). */
class HealthServerSpec extends AnyFunSuite {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort
    finally s.close()
  }

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("serves /health and /readiness with 200 {\"status\":\"UP\"} as application/json") {
    val srv = new HealthServer
    val port = freePort()
    srv.start(port)
    try {
      assert(srv.isRunning)
      for (path <- Seq("/health", "/readiness")) {
        val resp = get(port, path)
        assert(resp.statusCode() == 200, path)
        assert(resp.body() == "{\"status\":\"UP\"}", path)
        assert(resp.headers().firstValue("Content-Type").orElse("") == "application/json", path)
      }
    } finally srv.stop()
    assert(!srv.isRunning)
  }

  test("/metrics serves the listener snapshot in Prometheus 0.0.4 text format") {
    val stats = graft.observe.LatencyStats(
      batches = 5, rows = 42, anomalies = 7, p50Ms = 10.0, p95Ms = 20.0, p99Ms = 30.0)
    val srv = new HealthServer(Some(() => stats))
    val port = freePort()
    srv.start(port)
    try {
      val resp = get(port, "/metrics")
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("")
        == "text/plain; version=0.0.4; charset=utf-8")
      val lines = resp.body().linesIterator.toSeq
      assert(lines.contains("stream_sentinel_events_processed_total 42"))
      assert(lines.contains("stream_sentinel_anomalies_detected_total 7"))
      assert(lines.contains("stream_sentinel_batches_total 5"))
      assert(lines.contains("stream_sentinel_processing_latency_ms{quantile=\"0.5\"} 10.0"))
      assert(lines.contains("stream_sentinel_processing_latency_ms{quantile=\"0.99\"} 30.0"))
      assert(lines.count(_.startsWith("# TYPE")) == 4)
      // probes still served on the same server
      assert(get(port, "/health").statusCode() == 200)
    } finally srv.stop()
  }

  test("a blocked /metrics scrape never delays the liveness probe") {
    // The scrape path contends on the listener's stats lock; the probe
    // path must not (class invariant). Block the metrics supplier on a
    // latch, start a scrape, then require /health to answer while the
    // scrape is still stuck on the dedicated health-metrics thread.
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val srv = new HealthServer(Some(() => {
      entered.countDown()
      gate.await()
      graft.observe.LatencyStats(1, 1, 1, 1.0, 1.0, 1.0)
    }))
    val port = freePort()
    srv.start(port)
    try {
      val scrape = HttpClient.newHttpClient().sendAsync(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/metrics")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(entered.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "scrape never reached the metrics supplier")
      val t0 = System.nanoTime()
      assert(get(port, "/health").statusCode() == 200)
      val probeSec = (System.nanoTime() - t0) / 1e9
      assert(probeSec < 5.0, f"probe waited $probeSec%.1fs behind the scrape")
      gate.countDown()
      assert(scrape.get(10, java.util.concurrent.TimeUnit.SECONDS).statusCode() == 200)
    } finally {
      gate.countDown()
      srv.stop()
    }
  }

  test("no /metrics context without a metrics source") {
    val srv = new HealthServer
    val port = freePort()
    srv.start(port)
    try assert(get(port, "/metrics").statusCode() == 404)
    finally srv.stop()
  }

  test("rejects out-of-range ports with the reference's message") {
    val srv = new HealthServer
    for (bad <- Seq(0, -1, 65536)) {
      val ex = intercept[IllegalArgumentException](srv.start(bad))
      assert(ex.getMessage == s"Health port must be in range [1, 65535], got: $bad")
    }
  }

  test("bind failure is logged, not thrown; stop is idempotent") {
    val port = freePort()
    val first = new HealthServer
    first.start(port)
    try {
      val second = new HealthServer
      second.start(port) // port taken -> logged IOException, no throw
      assert(!second.isRunning)
      second.stop() // no-op before successful start
    } finally {
      first.stop()
      first.stop() // idempotent
    }
    assert(!first.isRunning)
  }
}
