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
  * Driver-side infra: this runs next to the `SparkSession`, not inside
  * executors, so cluster scale-up doesn't touch it.
  */
final class HealthServer {

  private val log = LoggerFactory.getLogger(classOf[HealthServer])
  private val body = "{\"status\":\"UP\"}".getBytes(StandardCharsets.UTF_8)
  private val running = new AtomicBoolean(false)
  @volatile private var server: HttpServer = _

  /** Start on `port`; must be in [1, 65535]. */
  def start(port: Int): Unit = {
    if (port < 1 || port > 65535)
      throw new IllegalArgumentException(
        s"Health port must be in range [1, 65535], got: $port")
    try {
      server = HttpServer.create(new InetSocketAddress(port), 0)
      server.createContext("/health", handle(_))
      server.createContext("/readiness", handle(_))
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
}
