package graft.rules

import graft.sources._
import org.apache.spark.sql.types.StructType

/** Stream/table definition: a named, schema'd source plus event-time
  * metadata. eKuiper equivalent: the stream registry populated by
  * `CREATE STREAM name (fields) WITH (TYPE=..., FORMAT=...,
  * DATASOURCE=..., TIMESTAMP=...)` (docs/en_US/sqls/streams.md).
  */
final case class StreamDef(name: String, source: Source,
                           isTable: Boolean = false,
                           timestampCol: Option[String] = None,
                           watermark: Option[String] = None,
                           typ: String = "memory",
                           schema: StructType = new StructType())

/** Catalog of streams and tables (SURVEY §2.8). Holds definitions
  * only — plans are built per rule at start, so a definition change
  * takes effect on the next rule (re)start, like the reference.
  */
final class Catalog {
  private val defs = new java.util.concurrent.ConcurrentHashMap[String, StreamDef]()

  def register(d: StreamDef): Unit = defs.put(d.name, d)
  def get(name: String): Option[StreamDef] = Option(defs.get(name))
  def drop(name: String): Unit = defs.remove(name)
  def list: Seq[String] = {
    import scala.jdk.CollectionConverters._
    defs.keySet().asScala.toSeq.sorted
  }

  /** eKuiper-style DDL:
    * {{{
    * CREATE STREAM demo (a BIGINT, b STRING) WITH
    *   (TYPE="file", FORMAT="json", DATASOURCE="/data/in",
    *    TIMESTAMP="ts", WATERMARK="10 seconds")
    * CREATE TABLE dim (...) WITH (TYPE="file", FORMAT="parquet", DATASOURCE="...")
    * }}}
    * TYPE ∈ file | memory | simulator | nexmark | sql | mqtt |
    * http_pull | http_push | websocket | sse | redis | neuron | edgex |
    * kafka | zmq.
    */
  def executeDdl(ddl: String): StreamDef = {
    val d = Catalog.parseDdl(ddl)
    register(d)
    d
  }
}

/** Named-schema registry (reference: internal/schema — schemas
  * registered once and referenced from stream DDL via SCHEMAID).
  * Schemas are Spark DDL field lists; a stream declared with
  * `SCHEMAID="name"` and an empty field list resolves its schema here.
  */
object SchemaRegistry {
  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  def register(name: String, fieldsDdl: String): StructType = {
    val s = StructType.fromDDL(fieldsDdl)
    schemas.put(name, s); s
  }
  def get(name: String): Option[StructType] = Option(schemas.get(name))
  def drop(name: String): Unit = schemas.remove(name)
  def list: Seq[String] = {
    import scala.jdk.CollectionConverters._
    schemas.keySet().asScala.toSeq.sorted
  }
}

object Catalog {
  private val ddlRe =
    """(?is)\s*CREATE\s+(STREAM|TABLE)\s+([A-Za-z_][A-Za-z0-9_]*)\s*\((.*?)\)\s*WITH\s*\((.*)\)\s*;?\s*""".r

  def parseDdl(ddl: String): StreamDef = ddl match {
    case ddlRe(kind, name, fields, withClause) =>
      // CONNECTION="id" layers a named connection's props under the
      // stream's own (stream props win) — reference confKey layering
      val props = Connections.resolve(parseWith(withClause))
      // `CREATE STREAM x () WITH (...)` = schemaless (eKuiper default):
      // file sources infer from existing data at stream start; with
      // SCHEMAID="name" the registered schema fills the empty list
      val schema =
        if (fields.trim.nonEmpty) StructType.fromDDL(fields)
        else parseWith(withClause).get("schemaid") match {
          case Some(sid) => SchemaRegistry.get(sid).getOrElse(
            throw new IllegalArgumentException(s"schema '$sid' is not registered"))
          case None => new StructType()
        }
      val tpe = props.getOrElse("type", "file").toLowerCase
      val isTable = kind.equalsIgnoreCase("TABLE")
      val source = sourceFor(tpe, name, schema, props, isTable = isTable)
      StreamDef(name, source, isTable = isTable,
        timestampCol = props.get("timestamp"),
        watermark = props.get("watermark"),
        typ = tpe, schema = schema)
    case _ => throw new IllegalArgumentException(s"cannot parse DDL: $ddl")
  }

  /** Build a Source from TYPE + props — shared by stream DDL and
    * graph-API inline source nodes (which carry the same property set,
    * docs/en_US/guide/rules/graph_rule.md "all source node shared the
    * same properties ... as defining a stream").
    */
  def sourceFor(tpe: String, name: String, schema: StructType,
                props: Map[String, String], isTable: Boolean = false): Source = {
    val inner = sourceFor0(tpe, name, schema, props, isTable)
    // lookup-table cache props (reference LookupConf, internal/topo/
    // node/lookup_node.go:37-39): CACHE="true" wraps the source so the
    // liveLookup re-resolve and point queries hit the backend at most
    // once per CACHETTL; CACHEMISSINGKEY (default true) caches empty
    // point-query results too. Wrapped here so TABLE DDL and graph-API
    // inline table nodes both get it — DDL props arrive lowercased by
    // parseWith but graph-node JSON keys keep their camelCase, so the
    // cache keys are matched case-insensitively
    val lower = props.map { case (k, v) => k.toLowerCase -> v }
    if (isTable && lower.get("cache").exists(_.toBoolean))
      TtlCachedSource(inner,
        lower.get("cachettl").map(Cron.parseDuration).getOrElse(600000L),
        lower.get("cachemissingkey").forall(_.toBoolean))
    else inner
  }

  private def sourceFor0(tpe: String, name: String, schema: StructType,
                         props: Map[String, String], isTable: Boolean): Source = {
    val fmt = props.getOrElse("format", "json").toLowerCase
    val ds = props.getOrElse("datasource", name)
    val declared = if (schema.isEmpty) None else Some(schema)
    tpe match {
      case "file" => FileSource(ds, fmt, declared, props - "type" - "format" - "datasource")
      case "memory" => MemorySource(ds)
      case "simulator" =>
        // rows come from SEED (newline-separated JSON objects) or — the
        // lookup-table form (reference internal/io/simulator/
        // lookupSource.go sLookupConfig) — from DATA, a JSON array of
        // objects; TABLE semantics then ride SimulatorSource.batch
        val seed = props.get("data").filter(_.trim.nonEmpty) match {
          case Some(arr) => org.json4s.jackson.JsonMethods.parse(arr) match {
            case org.json4s.JArray(xs) =>
              xs.map(o => org.json4s.jackson.JsonMethods.compact(o))
            case _ => throw new IllegalArgumentException(
              "simulator DATA must be a JSON array of objects")
          }
          case None =>
            props.getOrElse("seed", "").split('\n').toIndexedSeq.filter(_.nonEmpty)
        }
        SimulatorSource(seed, props.getOrElse("interval", "1000").toLong, schema)
      case "nexmark" => // DATASOURCE selects the event stream
        NexmarkSource(if (Seq("bid", "auction", "person").contains(ds)) ds else "bid")
      case "random" => // PATTERN='{"field": base, ...}', SEED, COUNT
        val pattern = """"([A-Za-z_][A-Za-z0-9_]*)"\s*:\s*(-?\d+)""".r
          .findAllMatchIn(props.getOrElse("pattern", """{"v": 0}"""))
          .map(m => m.group(1) -> m.group(2).toInt).toMap
        RandomSource(pattern, props.getOrElse("seed", "100").toInt,
          count = props.getOrElse("count", "1000").toLong,
          deduplicate = props.getOrElse("deduplicate", "0").toInt)
      case "sql" => // DATASOURCE = table; DBURL + optional INDEXFIELD/LIMIT/INTERVAL
        val dburl = props.getOrElse("dburl",
          throw new IllegalArgumentException("sql streams need a DBURL property"))
        if (isTable && !props.contains("indexfield"))
          SqlLookupSource(dburl, ds, props)
        else
          SqlSource(dburl, ds,
            indexFields = props.get("indexfield").toSeq
              .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty)),
            limit = props.getOrElse("limit", "0").toInt,
            intervalMs = props.getOrElse("interval", "1000").toLong,
            options = props)
      case "redis" if isTable =>
        // redis lookup table (reference internal/io/redis/lookup.go):
        // ADDR = host:port, DATASOURCE = database number, DATATYPE =
        // string | list; point-lookup freshness via the liveLookup path
        RedisLookupSource(
          props.getOrElse("addr", props.getOrElse("server",
            throw new IllegalArgumentException("redis lookup tables need an ADDR property"))),
          props.getOrElse("datatype", "string").toLowerCase, schema, props)
      case "http_pull" if isTable &&
          props.get("url").orElse(props.get("server")).exists(_.nonEmpty) =>
        // HTTP lookup table (reference internal/io/http/lookup_source
        // .go): TABLE DDL resolves through the liveLookup re-plan path,
        // one pull per micro-batch, all pull props incl. oauth apply
        HttpLookupSource(props.get("url").orElse(props.get("server")).get, schema, props)
      case "http_pull" if props.get("url").orElse(props.get("server")).exists(_.nonEmpty) =>
        // a URL prop makes the puller REAL (live GET/POST per pull,
        // with headers + oauth props); without one, the stub feed path
        HttpPullSource(props.get("url").orElse(props.get("server")).get, schema,
          props.getOrElse("interval", "1000").toLong, props)
      case "portable" =>
        // portable SOURCE plugin stream/table: PLUGIN + SYMBOL name the
        // registered plugin's source; DATASOURCE is the topic handed to
        // the symbol (reference runtime/source.go Control.DataSource)
        graft.plugins.PortableStreamSource(
          props.getOrElse("plugin",
            throw new IllegalArgumentException("portable streams need a PLUGIN property")),
          props.getOrElse("symbol",
            throw new IllegalArgumentException("portable streams need a SYMBOL property")),
          ds, schema, props)
      case k if ConnectorSource.kinds.contains(k) => ConnectorSource(k, ds, schema, props)
      case other => throw new IllegalArgumentException(s"unknown source type $other")
    }
  }

  /** KEY="value" pairs, comma-separated, case-insensitive keys.
    * Dotted keys (OAUTH.ACCESS.URL="…") address nested prop groups.
    */
  private[rules] def parseWith(s: String): Map[String, String] =
    """(?s)([A-Za-z_][A-Za-z0-9_.]*)\s*=\s*"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(s)
      .map(m => m.group(1).toLowerCase -> m.group(2).replace("\\\"", "\"").replace("\\n", "\n"))
      .toMap
}
