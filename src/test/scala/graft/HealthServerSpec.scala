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
