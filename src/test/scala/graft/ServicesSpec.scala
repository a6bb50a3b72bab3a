package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.rules._
import graft.sources.MemoryHub
import java.nio.charset.StandardCharsets.UTF_8

/** External REST function services (reference internal/service): a
  * registered service's methods become SQL functions backed by live
  * HTTP calls — tested against an in-process JDK server.
  */
class ServicesSpec extends SparkSuite {

  /** Service double: /scale doubles a number; /label uppercases a
    * JSON string; /concat2 joins a two-argument array call.
    */
  private def withService[A](f: String => A): A = {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def handler(fn: String => String): HttpHandler = (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val resp = fn(body).getBytes(UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    }
    server.createContext("/scale", handler(b => (b.trim.toDouble * 2).toString))
    server.createContext("/label", handler(b => b.toUpperCase))
    server.createContext("/concat2", handler { b =>
      // ["a","b"] -> "a+b"
      val parts = "\"([^\"]*)\"".r.findAllMatchIn(b).map(_.group(1)).toSeq
      "\"" + parts.mkString("+") + "\""
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("service functions run inside rule SQL over live HTTP") {
    withService { addr =>
      val eng = new RuleEngine(spark)
      val api = new RuleApi(eng)
      val (code, _) = api.handle("POST", "/services", s"""{
        |"name": "mathsvc", "addr": "$addr",
        |"functions": [
        |  {"name": "scale", "returnType": "double"},
        |  {"name": "label"},
        |  {"name": "concat2"}
        |]}""".stripMargin)
      assert(code == 200)

      MemoryHub.publish("svc_in",
        spark.createDataFrame(Seq(("a", 21.0), ("b", 4.5))).toDF("k", "v"))
      eng.createStream(
        """CREATE TABLE svcin (k STRING, v DOUBLE) WITH (TYPE="memory", DATASOURCE="svc_in")""")
      MemoryHub.drop("svc_out")
      eng.create(Rule("svc1",
        "SELECT k, scale(v) AS doubled, label(k) AS lk, concat2(k, 'x') AS joined FROM svcin",
        Seq(graft.sinks.MemorySink("svc_out"))))
      eng.start("svc1")
      val rows = MemoryHub.frame(spark, "svc_out").orderBy("k").collect()
      assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getString(2), r.getString(3))).toSeq ==
        Seq(("a", 42.0, "A", "a+x"), ("b", 9.0, "B", "b+x")))
    }
  }

  test("service registry surfaces through the management API") {
    withService { addr =>
      val api = new RuleApi(new RuleEngine(spark))
      api.handle("POST", "/services",
        s"""{"name":"s2","addr":"$addr","functions":["label"]}""")
      val (c1, list) = api.handle("GET", "/services")
      assert(c1 == 200 && list.contains("s2"))
      val (c2, one) = api.handle("GET", "/services/s2")
      assert(c2 == 200 && one.contains(addr) && one.contains("label"))
      val (c3, _) = api.handle("DELETE", "/services/s2")
      assert(c3 == 200)
      assert(!api.handle("GET", "/services")._2.contains("s2"))
    }
  }

  test("service call failure fails the rule loudly") {
    val eng = new RuleEngine(spark)
    Services.register(spark, Services.ServiceDef(
      "deadsvc", "http://127.0.0.1:1", Seq(Services.FunctionDef("deadfn"))))
    MemoryHub.publish("svc_dead_in",
      spark.createDataFrame(Seq(Tuple1("x"))).toDF("k"))
    eng.createStream(
      """CREATE TABLE svcdead (k STRING) WITH (TYPE="memory", DATASOURCE="svc_dead_in")""")
    intercept[Exception] {
      spark.sql("SELECT deadfn(k) FROM svcdead").collect()
    }
  }

  test("non-deterministic marking keeps service calls out of constant folding") {
    withService { addr =>
      val eng = new RuleEngine(spark)
      Services.register(spark, Services.ServiceDef(
        "foldsvc", addr, Seq(Services.FunctionDef("scale", returnType = "double"))))
      // a literal argument must still reach the wire (not be folded at
      // plan time into a cached constant) — the plan should carry the
      // call site
      val plan = spark.sql("SELECT scale(21.0) AS x").queryExecution
        .optimizedPlan.toString()
      assert(plan.contains("scale"), s"call site folded away:\n$plan")
    }
  }
}
