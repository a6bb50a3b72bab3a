package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Real http_pull source (reference: internal/io/http pull mode): GET
  * the endpoint, decode the JSON body (object or array of objects) to
  * rows of the declared schema. The fetch happens once per batch on
  * the driver — one endpoint, like the reference's puller — and the
  * decoded rows are distributed; a streaming rule gets a fresh pull
  * per micro-batch via the rate-source trigger.
  *
  * Works against in-container/localhost endpoints (zero-egress
  * environments); swap the URL for a real service in production.
  */
final case class HttpPullSource(url: String, schema: StructType,
                                intervalMs: Long = 1000,
                                options: Map[String, String] = Map.empty) extends Source {
  // `headers` prop: JSON object; values may carry {{.token}} templates
  // filled from the oauth token map (reference RawConf.Headers +
  // updateToken's parsedHeaders)
  private val baseHeaders = OAuthTokenManager.headerMap(options.get("headers"))
  private val oauth = OAuthTokenManager.fromOptions(options)
  private val method = options.getOrElse("method", "GET").toUpperCase
  private val body = options.getOrElse("body", "")
  // bodyType framing (reference httppull_source.go:118 sends the
  // configured BodyType; client.go:143-149 defaults GET/HEAD → none,
  // other methods → json)
  private val bodyType = graft.net.HttpBody.validate(
    options.getOrElse("bodyType", graft.net.HttpBody.defaultFor(method)))
  // response handling props (reference client.go RawConf)
  private val incremental = options.getOrElse("incremental", "false").toBoolean
  private val compressionOpt = options.getOrElse("compression", "")
  private val responseType = options.getOrElse("responseType", "code") match {
    case t @ ("code" | "body") => t
    case t => throw new IllegalArgumentException(
      s"invalid responseType '$t' (code or body, client.go:156-160)")
  }
  // last successful pull's body digest (driver-side, like the
  // reference's per-source lastMD5 state)
  @volatile private var lastMD5: String = ""

  private def fetch(): String = {
    val headers = oauth match {
      case Some(o) => o.headers(baseHeaders) // fetches the token on first use
      case None => baseHeaders
    }
    val c = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      c.setRequestMethod(method)
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      if (body.nonEmpty && bodyType != "none") {
        val (ctype, bytes) = graft.net.HttpBody.encode(bodyType,
          body.getBytes(StandardCharsets.UTF_8),
          options.getOrElse("fileFieldName", ""), Nil)
        if (ctype.nonEmpty && !headers.contains("Content-Type"))
          c.setRequestProperty("Content-Type", ctype)
        c.setDoOutput(true)
        c.getOutputStream.write(bytes)
      }
      val raw = c.getInputStream.readAllBytes()
      // `compression` declares what the endpoint was asked to send; a
      // response without Content-Encoding means the server ignored the
      // codec and the bytes are NOT what we'd decompress — error, like
      // the reference (client.go responseBodyDecompress)
      val bytes =
        if (compressionOpt.isEmpty) raw
        else if (c.getHeaderField("Content-Encoding") == null)
          throw new java.io.IOException(
            s"http_pull: no Content-Encoding in response; server does not speak '$compressionOpt'")
        else graft.functions.Compression.decompress(raw, compressionOpt)
      new String(bytes, StandardCharsets.UTF_8)
    } finally {
      c.disconnect()
      // the reference renews AFTER each send (client.go Send)
      oauth.foreach(_.afterSend())
    }
  }

  /** responseType="body": the HTTP code only says the transport
    * worked; each payload carries its own `code` field that must be
    * 2xx (reference client.go:368-390 — a missing code field fails,
    * matching MapToStruct's zero value).
    */
  private def checkBodyCodes(body: String): Unit = {
    import org.json4s._
    val payloads = org.json4s.jackson.JsonMethods.parse(body) match {
      case JArray(items) => items
      case other => List(other)
    }
    payloads.foreach { p =>
      val code = p \ "code" match {
        case JInt(v) => v.toInt
        case JLong(v) => v.toInt
        case JDouble(v) => v.toInt
        case _ => 0
      }
      if (code < 200 || code > 299)
        throw new java.io.IOException(
          s"http_pull responseType=body: payload code $code")
    }
  }

  private def decode(spark: SparkSession, body: String): DataFrame = {
    val lines =
      if (body.trim.startsWith("[")) Seq(body)
      else body.split('\n').toIndexedSeq.filter(_.trim.nonEmpty)
    val raw = spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
    // array bodies explode into one row per element
    if (body.trim.startsWith("["))
      raw.select(explode(from_json(col("value"),
        org.apache.spark.sql.types.ArrayType(schema))).as("m")).select(col("m.*"))
    else spark.read.schema(schema).json(raw)
  }

  def batch(spark: SparkSession): DataFrame = {
    val body = fetch()
    if (incremental) {
      // emit only when the body changed since the last pull
      // (reference client.go:361-365: MD5 the raw body, skip on match)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(body.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      if (md5 == lastMD5)
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      lastMD5 = md5
    }
    if (responseType == "body") checkBodyCodes(body)
    decode(spark, body)
  }

  /** One pull per rate tick: the rate stream triggers micro-batches;
    * each batch re-pulls the endpoint (mapped via the trigger row).
    */
  def stream(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException(
      "http_pull streaming: wrap batch() in a foreachBatch/trigger loop " +
        "(RuleEngine runs batch rules on triggers); continuous pull has no " +
        "exactly-once story, matching the reference's at-most-once puller")
}

/** HTTP lookup table (reference internal/io/http/lookup_source.go:
  * Lookup at :47-54 does one doPull per lookup, prunes to the
  * requested fields, and equality-matches the keys): a dimension
  * table whose rows live behind a GET/POST endpoint. DDL:
  * `CREATE TABLE t (...) WITH (TYPE="http_pull", URL="...")` — all the
  * pull props (method/body/headers/oauth.*) apply.
  *
  * Where the reference re-pulls per event, graft materializes the
  * pulled rows as a DataFrame and lets Catalyst plan the join (a
  * dimension served over one HTTP response broadcasts); the engine's
  * liveLookup path re-runs [[batch]] per micro-batch, so endpoint
  * updates land in the very next batch — the same freshness contract.
  */
final case class HttpLookupSource(url: String, schema: StructType,
                                  options: Map[String, String] = Map.empty)
    extends Source with LookupCapable {
  require(schema.nonEmpty, "http_pull lookup tables need declared columns")
  private val puller = HttpPullSource(url, schema, options = options)

  def batch(spark: SparkSession): DataFrame = puller.batch(spark)

  /** eKuiper Lookup(fields, keys, values): one pull, keys
    * equality-filtered, pruned to `fields`. (The reference prunes
    * BEFORE matching, so a key outside `fields` can never match —
    * lookup_source.go:52-53; graft filters first, which is what the
    * lookupJoin semantics mean for a SQL join.)
    */
  def lookup(spark: SparkSession, fields: Seq[String],
             keys: Seq[String], values: Seq[Any]): DataFrame =
    lookupByFilter(spark, fields, keys, values)

  def stream(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException(
      "http_pull lookup tables are bounded; use them as TABLE sources")
}

/** Real sse source (reference: internal/io/sse): connect to a
  * text/event-stream endpoint, read `data:` frames (until the server
  * closes or `maxEvents`), decode to the declared schema. The bounded
  * read is the batch form; a streaming rule re-reads per trigger, the
  * same at-most-once contract as the reference's SSE client.
  */
final case class SseSource(url: String, schema: StructType,
                           maxEvents: Int = 10000) extends Source {
  def batch(spark: SparkSession): DataFrame = {
    val c = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestProperty("Accept", "text/event-stream")
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(c.getInputStream, StandardCharsets.UTF_8))
    val events = scala.collection.mutable.ArrayBuffer[String]()
    try {
      var line = reader.readLine()
      while (line != null && events.size < maxEvents) {
        if (line.startsWith("data:")) events += line.stripPrefix("data:").trim
        line = reader.readLine()
      }
    } finally { reader.close(); c.disconnect() }
    spark.read.schema(schema).json(
      spark.createDataset(events.toSeq)(org.apache.spark.sql.Encoders.STRING))
  }

  def stream(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException(
      "sse streaming: re-read per trigger via a batch rule, or feed " +
        "ConnectorFeed from a long-lived client")
}

/** Real http_push receiver (reference: internal/io/http push mode): a
  * localhost HTTP endpoint that accepts POSTed JSON frames per topic
  * (`POST /push/{topic}`) into the ConnectorFeed, where
  * `ConnectorSource("http_push", topic, schema)` decodes them.
  */
object HttpPushEndpoint {
  final class Running private[HttpPushEndpoint] (server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  def start(port: Int = 0): Running = {
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port), 0)
    server.createContext("/push", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val topic = ex.getRequestURI.getPath.stripPrefix("/push/").takeWhile(_ != '/')
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val resp =
          if (ex.getRequestMethod == "POST" && topic.nonEmpty && body.nonEmpty) {
            ConnectorFeed.push("http_push", topic, body, System.currentTimeMillis())
            (200, """{"status":"ok"}""")
          } else (400, """{"error":"POST /push/{topic} with a JSON body"}""")
        val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(resp._1, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    new Running(server)
  }
}
