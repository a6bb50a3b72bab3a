package graft

import graft.plugins.{PortablePlugins, PortableWorker}
import graft.plugins.PortablePlugins.{PluginMeta, PortableFunction}
import org.json4s._

/** Portable plugin runtime (reference internal/plugin/portable):
  * control handshake + start/stop commands, FuncData/FuncReply call
  * protocol over the SP-TCP channels, SQL registration, and the real
  * process mode — a second JVM running the SDK example worker.
  */
class PortableSpec extends SparkSuite {

  private val handlers: Map[String, Seq[JValue] => JValue] = Map(
    "t_rev" -> { as =>
      JString(as.headOption.collect { case JString(s) => s.reverse }.getOrElse(""))
    },
    "t_addone" -> { as =>
      JInt(as.headOption.collect {
        case JInt(n) => n + 1
        case JLong(n) => BigInt(n) + 1
      }.getOrElse(BigInt(-1)))
    },
    "t_fail" -> { _ => throw new RuntimeException("boom from plugin") },
    "t_sum" -> { as =>
      JInt(as.headOption.collect {
        case JArray(xs) => xs.collect { case JInt(n) => n; case JLong(n) => BigInt(n) }.sum
      }.getOrElse(BigInt(-1)))
    })

  test("attach-mode plugin: handshake, start symbols, SQL calls round-trip") {
    var worker: PortableWorker.Running = null
    try {
      PortablePlugins.register(spark,
        PluginMeta("t_plug", functions = Seq(
          PortableFunction("t_rev", "string"),
          PortableFunction("t_addone", "bigint"),
          PortableFunction("t_sum", "bigint"),
          PortableFunction("t_fail", "string"))),
        onConf = conf => worker = PortableWorker.connect(conf, handlers))
      val r = spark.sql("SELECT t_rev('graft') AS r, t_addone(41) AS n").head()
      assert(r.getString(0) === "tfarg")
      assert(r.getLong(1) === 42L)
      // per-row evaluation over a table column
      import spark.implicits._
      val vals = Seq("ab", "cde").toDF("s")
        .selectExpr("t_rev(s) AS r").collect().map(_.getString(0)).sorted
      assert(vals.toSeq === Seq("ba", "edc"))
      // non-string array args decode type-directed (array<bigint> here),
      // not as garbage string reads of the unsafe array words
      val arr = spark.sql("SELECT t_sum(array(1L, 2L, 39L)) AS s").head().getLong(0)
      assert(arr === 42L)
      // a plugin-side error fails the row with the plugin's message
      val e = intercept[Exception](spark.sql("SELECT t_fail('x')").head())
      assert(String.valueOf(e.getMessage).contains("boom") ||
        String.valueOf(e.getCause.getMessage).contains("boom"))
      assert(PortablePlugins.status("t_plug") === "running")
      assert(PortablePlugins.list.contains("t_plug"))
    } finally {
      PortablePlugins.stop("t_plug")
      if (worker != null) worker.close()
    }
    assert(PortablePlugins.status("t_plug") === "stopped")
  }

  test("process-mode plugin: a second JVM serves the SDK example worker") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    try {
      PortablePlugins.register(spark,
        PluginMeta("t_proc", executable = Seq(javaBin, "-cp", cp,
          "graft.plugins.PortableWorkerMain"),
          functions = Seq(
            PortableFunction("plugin_rev", "string"),
            PortableFunction("plugin_addone", "bigint"))),
        initTimeoutMs = 60000)
      val r = spark.sql("SELECT plugin_rev('abc') AS r, plugin_addone(9) AS n").head()
      assert(r.getString(0) === "cba")
      assert(r.getLong(1) === 10L)
      assert(PortablePlugins.status("t_proc") === "running")
    } finally PortablePlugins.stop("t_proc")
    assert(PortablePlugins.status("t_proc") === "stopped")
  }

  test("source/sink plugins: second-JVM worker feeds a stream and receives a sink's rows") {
    def awaitCond(cond: => Boolean, what: String): Unit = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
      assert(cond, s"timed out waiting for $what")
    }
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    graft.sources.ConnectorFeed.clear("portable", "t/feed")
    try {
      PortablePlugins.register(spark,
        PluginMeta("t_conn", executable = Seq(javaBin, "-cp", cp,
          "graft.plugins.PortableWorkerMain"),
          sources = Seq("plugin_feed"),
          sinks = Seq("plugin_echo")),
        initTimeoutMs = 60000)
      // SOURCE: the worker pushes three seed frames when the symbol starts
      val src = graft.plugins.PortableStreamSource("t_conn", "plugin_feed",
        "t/feed", org.apache.spark.sql.types.StructType.fromDDL(
          "x BIGINT, y BIGINT, topic STRING"))
      awaitCond(src.batch(spark).count() == 3, "worker's seed frames in the feed")
      assert(src.batch(spark).agg(org.apache.spark.sql.functions.sum("x"))
        .head().getLong(0) == 6L)
      assert(src.batch(spark).select("topic").distinct().head().getString(0) == "t/feed",
        "DATASOURCE topic reached the worker's source symbol")
      // SINK with requireAck: each row crosses to the worker, which
      // echoes it back through the source channel — full round trip
      // across JVMs
      import spark.implicits._
      graft.plugins.PortableConnectorSink("t_conn", "plugin_echo",
        Map("requireAck" -> "true")).writeBatch(Seq(10L, 20L).toDF("y"))
      awaitCond(src.batch(spark).count() == 5, "echoed sink rows back in the feed")
      assert(src.batch(spark).agg(org.apache.spark.sql.functions.sum("y"))
        .head().getLong(0) == 30L)
      assert(PortablePlugins.status("t_conn") === "running")
    } finally PortablePlugins.stop("t_conn")
  }

  test("REST surface: POST/GET/DELETE /plugins/portables drive the runtime") {
    val a = new graft.rules.RuleApi(new graft.rules.RuleEngine(spark))
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val body =
      s"""{"name":"t_rest","executable":${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(JArray(List(javaBin, "-cp", cp,
          "graft.plugins.PortableWorkerMain").map(JString(_))))) },
         |"functions":[{"name":"plugin_rev","returnType":"string"}]}""".stripMargin
    try {
      val (c1, b1) = a.handle("POST", "/plugins/portables", body)
      assert(c1 == 200, b1)
      val (c2, b2) = a.handle("GET", "/plugins/portables")
      assert(c2 == 200 && b2.contains("t_rest") && b2.contains("running"))
      assert(spark.sql("SELECT plugin_rev('xy')").head().getString(0) === "yx")
    } finally a.handle("DELETE", "/plugins/portables/t_rest")
    assert(PortablePlugins.status("t_rest") === "stopped")
  }

  test("a killed plugin process is restarted on the next call") {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    try {
      PortablePlugins.register(spark,
        PluginMeta("t_crash", executable = Seq(javaBin, "-cp", cp,
          "graft.plugins.PortableWorkerMain"),
          functions = Seq(PortableFunction("plugin_rev", "string"))),
        initTimeoutMs = 60000)
      assert(spark.sql("SELECT plugin_rev('abc')").head().getString(0) === "cba")
      // kill the worker out from under the engine
      PortablePlugins.killProcessForTest("t_crash")
      assert(PortablePlugins.status("t_crash") === "crashed")
      // next call restarts the process, redoes handshake + symbols
      assert(spark.sql("SELECT plugin_rev('def')").head().getString(0) === "fed")
      assert(PortablePlugins.status("t_crash") === "running")
    } finally PortablePlugins.stop("t_crash")
  }

  test("registering a duplicate plugin name is rejected") {
    var worker: PortableWorker.Running = null
    try {
      PortablePlugins.register(spark, PluginMeta("t_dup",
        functions = Seq(PortableFunction("t_rev"))),
        onConf = conf => worker = PortableWorker.connect(conf, handlers))
      intercept[IllegalArgumentException](
        PortablePlugins.register(spark, PluginMeta("t_dup")))
    } finally {
      PortablePlugins.stop("t_dup")
      if (worker != null) worker.close()
    }
  }
}
