package graft.rules

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** HTTP frontend for RuleApi — the reference's REST management server
  * (internal/server) on the JDK's built-in HttpServer, zero extra
  * dependencies. Binds localhost only (this engine's management plane
  * is same-host, like the reference's default).
  *
  * {{{
  * val srv = RuleServer.start(engine, port = 9081)
  * // curl -X POST localhost:9081/streams -d '{"sql":"CREATE STREAM ..."}'
  * srv.stop()
  * }}}
  */
final class RuleServer private (server: HttpServer) {
  /** Actual bound port (useful when started with port = 0). */
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object RuleServer {
  def start(engine: RuleEngine, port: Int = 9081): RuleServer = {
    val api = new RuleApi(engine)
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port), 0)
    // without an executor every request shares the single dispatch
    // thread — one open SSE feed would wedge the whole management API
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "rule-server"); t.setDaemon(true); t
    }))
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val path = ex.getRequestURI.getPath
        // trial-rule output feed (reference trial sink endpoint
        // /test/{id}): server-sent events until the run completes
        if (ex.getRequestMethod == "GET" && path.startsWith("/test/")) {
          api.trials.get(path.stripPrefix("/test/")) match {
            case Some(t) =>
              ex.getResponseHeaders.set("Content-Type", "text/event-stream")
              ex.sendResponseHeaders(200, 0)
              val os = ex.getResponseBody
              try {
                def send(item: String): Unit = {
                  os.write(s"data: $item\n\n".getBytes(StandardCharsets.UTF_8))
                  os.flush()
                }
                var open = true
                while (open) {
                  val item = t.feed.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
                  if (item != null) send(item)
                  else if (t.done) {
                    // rows enqueued between the poll timing out and the
                    // done flag flipping must still go out: drain fully
                    var tail = t.feed.poll()
                    while (tail != null) { send(tail); tail = t.feed.poll() }
                    open = false
                  }
                }
              } catch { case _: java.io.IOException => () } // client went away
              finally ex.close()
            case None =>
              val msg = s"""{"error":"trial rule not found"}""".getBytes(StandardCharsets.UTF_8)
              ex.sendResponseHeaders(404, msg.length)
              ex.getResponseBody.write(msg)
              ex.close()
          }
          return
        }
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        // forward the query string — handle() parses it (?limit= on
        // the trace listing, per the reference's REST surface)
        val pathWithQuery = Option(ex.getRequestURI.getRawQuery)
          .fold(path)(q => s"$path?$q")
        val (status, json) =
          try api.handle(ex.getRequestMethod, pathWithQuery, body)
          catch { case e: Exception => (500, s"""{"error":"${e.getMessage}"}""") }
        val bytes = json.getBytes(StandardCharsets.UTF_8)
        // the prometheus exposition is text, everything else is JSON
        ex.getResponseHeaders.set("Content-Type",
          if (path == "/metrics/prometheus") "text/plain; version=0.0.4; charset=utf-8"
          else "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    new RuleServer(server)
  }
}
