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
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val (status, json) =
          try api.handle(ex.getRequestMethod, ex.getRequestURI.getPath, body)
          catch { case e: Exception => (500, s"""{"error":"${e.getMessage}"}""") }
        val bytes = json.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    new RuleServer(server)
  }
}
