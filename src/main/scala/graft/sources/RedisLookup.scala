package graft.sources

import graft.net.RedisClient
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Redis-backed lookup table (reference: internal/io/redis/lookup.go —
  * conf at :30-38, Lookup at :85-120): a dimension table whose rows
  * live in redis as JSON values. `dataType="string"` reads one row
  * per key via GET; `"list"` reads one row per list element via
  * LRANGE. The reference's DATASOURCE prop is the numbered database
  * (SELECT).
  *
  * Where the reference resolves one point lookup per event through a
  * go-redis call, graft materializes the table as a DataFrame and
  * lets Catalyst plan the join — a dimension this small (it fits a
  * redis instance) broadcasts, so the stream side never shuffles, and
  * the engine's liveLookup path re-runs [[batch]] per micro-batch so
  * key updates land in the very next batch, the same freshness
  * contract as the reference's per-event query.
  *
  * Scale shape: the driver SCANs only the key names (bounded — key
  * strings are tiny next to values); values fetch on EXECUTORS, one
  * connection per partition. The redis key itself surfaces as a
  * column (`keyColumn` prop, default "key") so SQL joins can target
  * it — the reference has no such column because its key is implicit
  * in the Lookup call.
  */
final case class RedisLookupSource(server: String,
                                   dataType: String = "string",
                                   schema: StructType = new StructType(),
                                   options: Map[String, String] = Map.empty)
    extends Source with LookupCapable {
  require(Seq("string", "list").contains(dataType),
    s"redis lookup dataType must be string or list, got $dataType")

  private val keyColumn = options.getOrElse("keycolumn", "key")
  private val dbIndex = options.get("datasource").flatMap(_.toIntOption).getOrElse(0)
  private val password = options.get("password").filter(_.nonEmpty)

  // Schemaless tables infer the value schema from the fetched JSON once
  // and reuse it across liveLookup re-plans — without this, every
  // micro-batch pays a second full redis fetch just to re-infer the
  // same schema. Row SHAPE is sticky per table lifetime; VALUES stay
  // per-batch fresh (the fetch itself always re-runs).
  @transient @volatile private var inferredSchema: StructType = null

  private def connect(): RedisClient = {
    val c = RedisClient.connect(server, password)
    if (dbIndex != 0) c.select(dbIndex)
    c
  }

  def batch(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // driver side: key names only (SCAN walk, never KEYS)
    val ks = {
      val c = connect()
      try c.scanKeys(options.getOrElse("pattern", "*"))
      finally c.close()
    }
    val (srv, dt, pw, dbi) = (server, dataType, password, dbIndex)
    val parts = math.max(1, math.min(ks.size, 32))
    // executor side: one connection per partition fetches its keys
    val kv: org.apache.spark.sql.Dataset[(String, String)] =
      spark.createDataset(ks).repartition(parts).mapPartitions { it =>
        val c = RedisClient.connect(srv, pw)
        if (dbi != 0) c.select(dbi)
        try {
          val rows = it.flatMap { k =>
            // a scan pattern like "*" also matches keys of OTHER redis
            // types; GET/LRANGE on those replies -WRONGTYPE. Skip them
            // (they're not this table's rows) instead of failing the
            // whole batch — and with it every micro-batch under
            // liveLookup.
            try {
              if (dt == "string") c.get(k).map(k -> _).toList
              else c.lrange(k).map(k -> _)
            } catch {
              case e: java.io.IOException
                if String.valueOf(e.getMessage).contains("WRONGTYPE") => Nil
            }
          }.toVector
          rows.iterator
        } finally c.close()
      }
    val valueSchema = resolveValueSchema(spark, kv.map(_._2))
    kv.select(col("_1").as(keyColumn),
        from_json(col("_2"), valueSchema).as("v"))
      .select(col(keyColumn) +: valueSchema.fieldNames.toIndexedSeq.map(f => col(s"v.$f")): _*)
  }

  /** eKuiper Lookup(fields, keys, values): redis supports exactly one
    * key — the redis key itself (lookup.go:87-89). Point round-trips,
    * no scan.
    */
  def lookup(spark: SparkSession, fields: Seq[String],
             keys: Seq[String], values: Seq[Any]): DataFrame = {
    require(keys.length == 1, s"redis lookup only supports one key, got $keys")
    import spark.implicits._
    val k = String.valueOf(values.head)
    val c = connect()
    val jsons =
      try if (dataType == "string") c.get(k).toSeq else c.lrange(k)
      finally c.close()
    val ds = spark.createDataset(jsons.map(k -> _))
    val valueSchema = resolveValueSchema(spark, ds.map(_._2))
    val df = ds.select(col("_1").cast(StringType).as(keyColumn),
        from_json(col("_2"), valueSchema).as("v"))
      .select(col(keyColumn) +: valueSchema.fieldNames.toIndexedSeq.map(f => col(s"v.$f")): _*)
    if (fields.isEmpty) df else df.select(fields.map(col).toIndexedSeq: _*)
  }

  /** Declared schema wins; otherwise infer from the fetched JSON once
    * and cache for the table's lifetime (liveLookup re-plans reuse it).
    */
  private def resolveValueSchema(spark: SparkSession,
                                 jsons: org.apache.spark.sql.Dataset[String]): StructType = {
    if (schema.nonEmpty) StructType(schema.filterNot(_.name == keyColumn))
    else {
      if (inferredSchema == null) {
        val inferred = spark.read.json(jsons).schema
        // an empty fetch infers an empty schema — do NOT pin that for
        // the table's lifetime, or rows arriving later parse to
        // nothing; re-infer until a non-empty shape shows up
        if (inferred.nonEmpty) inferredSchema = inferred
        else return inferred
      }
      inferredSchema
    }
  }

  def stream(spark: SparkSession): DataFrame =
    throw new UnsupportedOperationException(
      "redis lookup tables are bounded; use them as TABLE sources")
}
