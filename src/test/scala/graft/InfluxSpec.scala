package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sinks.InfluxSink
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/** Influx v1/v2 sink tests against a live in-process HTTP server
  * capturing the write endpoint: URL shape, auth headers, and the
  * codegen-rendered line protocol (escaping, typed fields, timestamp
  * precision).
  */
class InfluxSpec extends SparkSuite {

  private final case class Captured(path: String, query: String,
                                    auth: String, body: String)

  private def withServer[A](f: (String, ConcurrentLinkedQueue[Captured]) => A): A = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val captured = new ConcurrentLinkedQueue[Captured]()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        captured.add(Captured(ex.getRequestURI.getPath,
          Option(ex.getRequestURI.getQuery).getOrElse(""),
          Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""), body))
        ex.sendResponseHeaders(204, -1)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", captured)
    finally server.stop(0)
  }

  import spark.implicits._

  test("influx v1: line protocol with tags, typed fields, and ts column") {
    withServer { (addr, captured) =>
      val df = Seq(
        ("dev a", 21.5, 42L, true, 1700000000123L),
        ("dev,b", 22.0, 7L, false, 1700000000456L)
      ).toDF("device", "temp", "hum", "ok", "ts")
      InfluxSink(addr, "room temps", Map(
        "database" -> "iot", "precision" -> "ms", "tsFieldName" -> "ts",
        "tag:device" -> "{{device}}", "fields" -> "temp,hum,ok",
        "username" -> "u1", "password" -> "p1")).writeBatch(df)
      val reqs = captured.toArray(Array.empty[Captured])
      assert(reqs.nonEmpty)
      assert(reqs.forall(_.path == "/write"))
      assert(reqs.head.query == "db=iot&precision=ms")
      // basic auth carried
      val cred = new String(java.util.Base64.getDecoder.decode(
        reqs.head.auth.stripPrefix("Basic ")), StandardCharsets.UTF_8)
      assert(cred == "u1:p1")
      val lines = reqs.flatMap(_.body.split("\n")).sorted
      assert(lines.toSeq == Seq(
        "room\\ temps,device=dev\\ a temp=21.5,hum=42i,ok=true 1700000000123",
        "room\\ temps,device=dev\\,b temp=22.0,hum=7i,ok=false 1700000000456").sorted)
    }
  }

  test("influx v2: token auth, org/bucket query, string fields quoted") {
    withServer { (addr, captured) =>
      val df = Seq((1L, "say \"hi\"", 3.5)).toDF("ts", "msg", "v")
      InfluxSink(addr, "logs", Map(
        "org" -> "acme", "bucket" -> "b1", "token" -> "sekret",
        "precision" -> "s", "tsFieldName" -> "ts")).writeBatch(df)
      val reqs = captured.toArray(Array.empty[Captured])
      assert(reqs.length == 1)
      assert(reqs.head.path == "/api/v2/write")
      assert(reqs.head.query == "org=acme&bucket=b1&precision=s")
      assert(reqs.head.auth == "Token sekret")
      assert(reqs.head.body == "logs msg=\"say \\\"hi\\\"\",v=3.5 1")
    }
  }

  test("influx: without tsFieldName the write-time clock stamps each line") {
    withServer { (addr, captured) =>
      val before = System.currentTimeMillis()
      InfluxSink(addr, "m", Map("database" -> "d"))
        .writeBatch(Seq((1.0, 2.0)).toDF("a", "b"))
      val after = System.currentTimeMillis()
      val reqs = captured.toArray(Array.empty[Captured])
      val line = reqs.map(_.body).mkString
      val ts = line.split(" ").last.toLong
      assert(ts >= before && ts <= after, s"line ts $ts outside [$before, $after]")
      assert(line.startsWith("m a=1.0,b=2.0 "))
    }
  }

  test("influx: null fields are elided per-point, not whole-point drops") {
    withServer { (addr, captured) =>
      val df = Seq(
        (1L, Some(21.5), Some(42L), Some("dev1")),   // full point
        (2L, None, Some(7L), Some("dev2")),          // temp null → elided
        (3L, Some(9.5), Some(3L), None),             // tag null → tag elided
        (4L, None, None, Some("dev4"))               // all fields null → dropped
      ).toDF("ts", "temp", "hum", "device")
      InfluxSink(addr, "m", Map(
        "database" -> "d", "tsFieldName" -> "ts",
        "tag:device" -> "{{device}}", "fields" -> "temp,hum")).writeBatch(df)
      val lines = captured.toArray(Array.empty[Captured])
        .flatMap(_.body.split("\n")).sorted.toSeq
      assert(lines == Seq(
        "m,device=dev1 temp=21.5,hum=42i 1",
        "m,device=dev2 hum=7i 2",
        "m temp=9.5,hum=3i 3").sorted)
    }
  }

  test("influx: non-2xx write raises (ReliableSink contract)") {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.sendResponseHeaders(500, -1); ex.close()
      }
    })
    server.start()
    try {
      val e = intercept[Exception] {
        InfluxSink(s"http://127.0.0.1:${server.getAddress.getPort}", "m",
          Map("database" -> "d")).writeBatch(Seq((1.0, 2.0)).toDF("a", "b"))
      }
      assert(e.getMessage.contains("500") ||
        Option(e.getCause).exists(_.getMessage.contains("500")))
    } finally server.stop(0)
  }
}
