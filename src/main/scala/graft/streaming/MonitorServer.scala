package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The ops HTTP surface — the reference serves replication lag from a
  * small HTTP endpoint and exposes a `/restart_replication` control
  * route (runner.py:55-95; monitoring.py:27-78). Here the metrics come
  * straight from the [[LagMonitor]] listener (the stream already
  * publishes them), served by the JDK's built-in HttpServer — no extra
  * dependency, one daemon thread:
  *
  *  - `GET /health`  → `{"status":"ok","queries":N}`
  *  - `GET /metrics` → per-query batchId / rows / batch duration /
  *    `lag_seconds` (monitoring.py's headline metric)
  *  - `GET /restart_replication` → invokes the restart hook when the
  *    deployment registered one (the reference stops and relaunches its
  *    child processes; here the hook typically stops and restarts the
  *    streaming query on the same checkpoint)
  *
  * Enabled by the reference's own config keys `http_host` / `http_port`
  * (config.py:160-161); port 0 binds ephemeral (tests read `port`).
  */
final class MonitorServer(
    monitor: LagMonitor,
    host: String,
    requestedPort: Int,
    restart: Option[() => Unit] = None,
    /** Extra top-level `/metrics` gauges, evaluated per request — e.g.
      * `pending_staged_loads`, the "a snapshot died and nobody resumed
      * or abandoned it" signal (its staged epoch stays pinned until an
      * operator acts; see GraftTable.abandonStagedLoad). */
    gauges: () => Map[String, Long] = () => Map.empty) {

  private val server =
    HttpServer.create(new InetSocketAddress(host, requestedPort), 0)

  private def reply(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length)
    try x.getResponseBody.write(bytes) finally x.close()
  }

  server.createContext("/health", (x: HttpExchange) =>
    reply(x, 200, s"""{"status":"ok","queries":${monitor.all.size}}"""))

  server.createContext("/metrics", (x: HttpExchange) => {
    val now = System.currentTimeMillis()
    val qs = monitor.all.map { case (id, p) =>
      s""""$id":{"batch_id":${p.batchId},"num_input_rows":${p.numInputRows},""" +
        s""""batch_duration_ms":${p.batchDurationMs},""" +
        s""""lag_seconds":${p.lagSeconds(now)}}"""
    }.mkString("{", ",", "}")
    // a throwing gauge must degrade the metric, not drop the connection
    // (same contract as the /restart_replication guard below): the
    // built-in server otherwise leaks the exchange and the scraper sees
    // an empty reply with no record of the failure
    val extra =
      try gauges().toSeq.sortBy(_._1)
        .map { case (k, v) => s""","$k":$v""" }.mkString
      catch { case scala.util.control.NonFatal(e) =>
        s""","gauges_error":"${e.getClass.getSimpleName}""""
      }
    reply(x, 200, s"""{"timestamp_ms":$now,"queries":$qs$extra}""")
  })

  server.createContext("/restart_replication", (x: HttpExchange) =>
    restart match {
      case Some(hook) =>
        // a throwing hook must still produce an HTTP response — the
        // built-in server otherwise drops the connection and the ops
        // client sees an empty reply with no record of the failure
        try {
          hook()
          reply(x, 200, """{"restarted":true}""")
        } catch {
          case e: Throwable =>
            reply(x, 500,
              s"""{"error":${jsonStr(s"restart failed: ${e.getMessage}")}}""")
        }
      case None =>
        reply(x, 501, """{"error":"no restart hook registered"}""")
    })

  private def jsonStr(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  server.setExecutor(null) // serve on the dispatch thread; ops-rate traffic
  server.start()

  /** The bound port (differs from the requested one when it was 0). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}
