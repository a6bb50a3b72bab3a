package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** InfluxDB sinks (reference: extensions/impl/influx — v1 API — and
  * influx2, sharing the tspoint transform in
  * extensions/impl/tspoint/transform.go).
  *
  * The reference converts each map row to a client Point on a single
  * goroutine; graft renders the LINE PROTOCOL itself as one codegen
  * Column expression — measurement + escaped tags + typed field set +
  * timestamp — so point formatting runs distributed inside
  * whole-stage codegen, and executors POST the assembled lines per
  * partition (`/write` v1, `/api/v2/write` v2).
  *
  * Options (names follow the reference's props):
  *  - `database` (v1) / `org` + `bucket` + `token` (v2)
  *  - `username`/`password` (v1 basic auth)
  *  - `measurement` — static measurement name
  *  - `precision` — ms (default) | s | us | ns
  *  - `tsFieldName` — column holding the epoch timestamp ALREADY in
  *    `precision` units (reference getTime); absent → write-time now
  *  - `tag:<name>` — tag value template; `{{field}}` substitutes row
  *    columns (the reference's tags map with dataTemplate values)
  *  - `fields` — comma list of columns that become influx fields
  *    (default: every non-tag, non-ts column)
  */
final case class InfluxSink(addr: String, measurement: String,
                            options: Map[String, String] = Map.empty) extends Sink {
  private val v2 = options.get("version").contains("2") || options.contains("bucket")
  private val precision = options.getOrElse("precision", "ms")
  require(Seq("ms", "s", "us", "ns").contains(precision),
    s"precision $precision is not supported") // reference transform.go:36-44

  /** Line-protocol escaping (influxdata line protocol spec):
    * measurement escapes `,` and space; tag keys/values additionally
    * escape `=`; field string values are double-quoted with `\`/`"`
    * escaped.
    */
  private def escMeasurement(s: String): String =
    s.replace(",", "\\,").replace(" ", "\\ ")
  private def escTagLit(s: String): String =
    s.replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")
  private def escTagCol(c: Column): Column =
    regexp_replace(c.cast("string"), "([,= ])", "\\\\$1")

  /** One influx field rendered per the column's Spark type: integrals
    * get the `i` suffix, strings quote-escape, booleans pass through —
    * the typing the reference delegates to the client library's Point.
    */
  private def fieldValue(dt: DataType, c: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      concat(c.cast("string"), lit("i"))
    case FloatType | DoubleType | _: DecimalType => c.cast("string")
    case BooleanType => c.cast("string")
    case _ => concat(lit("\""),
      regexp_replace(c.cast("string"), "([\"\\\\])", "\\\\$1"), lit("\""))
  }

  /** Row timestamp in `precision` units: tsFieldName column as-is
    * (reference treats it as already scaled), else now().
    */
  private def tsCol(df: DataFrame): Column =
    options.get("tsFieldName") match {
      case Some(f) => df(f).cast("long")
      case None => precision match {
        case "s" => unix_seconds(current_timestamp())
        case "us" => unix_micros(current_timestamp())
        case "ns" => unix_micros(current_timestamp()) * 1000L
        case _ => unix_millis(current_timestamp())
      }
    }

  /** The whole line as one Column. Null handling mirrors the
    * reference's tspoint transform: a null FIELD (or tag) is elided
    * while the point survives with its remaining fields — concat_ws
    * skips null fragments — and only a point with no non-null fields
    * at all (or a null timestamp) is dropped.
    */
  private[sinks] def lineColumn(df: DataFrame): Column = {
    val tags = options.collect { case (k, tpl) if k.startsWith("tag:") =>
      val rendered = Sink.templateParts(tpl).map {
        case Left(litPart) => lit(escTagLit(litPart))
        case Right(field) => escTagCol(df(field))
      }
      // a null tag value elides that tag, not the whole point
      coalesce(
        concat((lit("," + escTagLit(k.stripPrefix("tag:")) + "=") +: rendered): _*),
        lit(""))
    }.toSeq
    val tagCols = options.collect { case (k, tpl) if k.startsWith("tag:") =>
      Sink.templateParts(tpl).collect { case Right(f) => f }
    }.flatten.toSet
    val fieldNames = options.get("fields") match {
      case Some(fs) => fs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => df.schema.fieldNames.toSeq
        .filterNot(tagCols).filterNot(options.get("tsFieldName").toSet)
    }
    require(fieldNames.nonEmpty, "influx sink needs at least one field column")
    // `name=value` per field, null when the column is null — concat_ws
    // then drops exactly the null fields from the comma-joined set
    val fieldSet = fieldNames.map { f =>
      val dt = df.schema(f).dataType
      when(df(f).isNotNull, concat(lit(escTagLit(f) + "="), fieldValue(dt, df(f))))
    }
    val fieldsPart = concat_ws(",", fieldSet: _*)
    when(length(fieldsPart) > 0,
      concat(
        (lit(escMeasurement(measurement)) +: tags) :+
          lit(" ") :+ fieldsPart :+ lit(" ") :+ tsCol(df).cast("string"): _*))
  }

  private def writeUrl: String =
    if (v2)
      s"$addr/api/v2/write?org=${enc(options.getOrElse("org", ""))}" +
        s"&bucket=${enc(options.getOrElse("bucket", ""))}&precision=$precision"
    else {
      // InfluxDB 1.x spells microseconds "u", not the v2 API's "us"
      val p1 = if (precision == "us") "u" else precision
      s"$addr/write?db=${enc(options.getOrElse("database", ""))}&precision=$p1"
    }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  def writeBatch(df: DataFrame): Unit = {
    val url = writeUrl
    val auth: Option[(String, String)] =
      if (v2) options.get("token").map(t => "Authorization" -> s"Token $t")
      else for {
        u <- options.get("username")
        p <- options.get("password")
      } yield "Authorization" -> ("Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$u:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val batchSize = options.getOrElse("batchSize", "5000").toInt
    // note: Sink.shaped is NOT applied — `fields` selects influx field
    // columns here (reference WriteOptions.Fields), and tag/ts columns
    // must stay visible to lineColumn. Null fields/tags are elided
    // per-point inside lineColumn; only all-fields-null or null-ts
    // points come back null and are dropped here.
    df.select(lineColumn(df).as("line"))
      .where(col("line").isNotNull)
      .foreachPartition { (rows: Iterator[Row]) =>
        rows.map(_.getString(0)).grouped(batchSize).foreach { lines =>
          InfluxSink.post(url, auth, lines.mkString("\n"))
        }
      }
  }
}

object InfluxSink {
  /** Executor-side line-protocol POST; non-2xx raises so ReliableSink
    * can spool and resend the batch.
    */
  private[sinks] def post(url: String, auth: Option[(String, String)], body: String): Unit = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "text/plain; charset=utf-8")
      auth.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.getOutputStream.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"influx write failed: HTTP $code")
    } finally conn.disconnect()
  }
}
