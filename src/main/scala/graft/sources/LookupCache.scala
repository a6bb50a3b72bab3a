package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Point-query capability shared by the lookup-table sources
  * (http_pull / sql / redis / simulator): equality-match `keys` to
  * `values`, prune to `fields` — the reference's Lookup contract
  * (internal/pkg/def: LookupSource.Lookup).
  */
trait LookupCapable { this: Source =>
  def lookup(spark: SparkSession, fields: Seq[String],
             keys: Seq[String], values: Seq[Any]): DataFrame

  /** Default point-query: equality-filter the bounded [[Source.batch]]
    * read, prune to `fields` — shared so the filter/prune semantics
    * cannot drift between the sources that lookup this way.
    */
  protected def lookupByFilter(spark: SparkSession, fields: Seq[String],
                               keys: Seq[String], values: Seq[Any]): DataFrame = {
    require(keys.length == values.length, "keys/values length mismatch")
    val filtered = keys.zip(values).foldLeft(batch(spark)) {
      case (df, (k, v)) => df.filter(col(k) === lit(v))
    }
    if (fields.isEmpty) filtered
    else filtered.select(fields.map(col).toIndexedSeq: _*)
  }
}

/** TTL cache for lookup tables (reference LookupConf
  * `cache`/`cacheTtl`/`cacheMissingKey`, internal/topo/node/
  * lookup_node.go:37-39,138-140 and internal/topo/lookup/cache/
  * cache.go): without it, the engine's liveLookup path re-pulls the
  * dimension from its backend (HTTP endpoint, database, redis) every
  * micro-batch — against a slow or per-call-priced endpoint the cache
  * is the difference between usable and not.
  *
  * Two cache layers, mirroring graft's two access paths:
  *  - [[batch]] (the liveLookup table re-resolve): the pulled
  *    dimension persists as a cluster-cached RDD snapshot and is
  *    re-wrapped into each micro-batch's session until the TTL
  *    expires — the data stays distributed (never collected), so a
  *    large dimension is as safe cached as uncached, and the rebuild
  *    per session is plan-only.
  *  - [[lookup]] (point queries): per-key driver cache of the result
  *    rows, keyed on (fields, keys, values) exactly like the
  *    reference's string cache key; `cacheMissingKey` controls
  *    whether empty results cache (reference cache.go:79-81). Point
  *    results are per-key dimension rows — inherently small.
  *
  * `ttlMs <= 0` means cache-forever (the reference's zero-expiry
  * behavior: no eviction ticker). Thread-safe: the engine may run
  * concurrent micro-batches of different rules over one table.
  */
final case class TtlCachedSource(inner: Source, ttlMs: Long,
                                 cacheMissingKey: Boolean = true)
    extends Source with LookupCapable {

  // ---- table-snapshot layer -------------------------------------
  @transient private var snapAt = 0L
  @transient private var snapSchema: StructType = _
  @transient private var snapRdd: org.apache.spark.rdd.RDD[Row] = _
  // the generation BEFORE the current snapshot: kept persisted for one
  // extra TTL window so a micro-batch job still reading it when a
  // refresh lands doesn't lose its blocks (an eager unpersist would
  // force recomputation through the inner source's lineage — re-pulling
  // the backend mid-job and yielding rows inconsistent within a batch)
  @transient private var prevRdd: org.apache.spark.rdd.RDD[Row] = _

  /** Backend fetches performed (tests assert cache effectiveness). */
  val fetches = new java.util.concurrent.atomic.AtomicLong()

  private def expired(at: Long, now: Long): Boolean =
    ttlMs > 0 && now - at >= ttlMs

  def batch(spark: SparkSession): DataFrame = synchronized {
    val now = System.currentTimeMillis()
    if (snapRdd == null || expired(snapAt, now)) {
      // retire the generation before last; the immediately-previous
      // snapshot survives one more TTL window for in-flight readers
      if (prevRdd != null) { prevRdd.unpersist(blocking = false); prevRdd = null }
      prevRdd = snapRdd
      val df = inner.batch(spark)
      fetches.incrementAndGet()
      snapSchema = df.schema
      snapRdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      // materialize now: the backend pull happens at refresh time, not
      // lazily inside some later micro-batch's job
      snapRdd.count()
      snapAt = now
    }
    // plan-only rebuild: the cached RDD is context-level, so it wraps
    // into any (cloned) session the engine plans a micro-batch in
    spark.createDataFrame(snapRdd, snapSchema)
  }

  /** Streams pass through — the cache is a table concept. */
  def stream(spark: SparkSession): DataFrame = inner.stream(spark)

  /** Drop both cache layers; the next access re-pulls. */
  def invalidate(): Unit = synchronized {
    if (snapRdd != null) { snapRdd.unpersist(blocking = false); snapRdd = null }
    if (prevRdd != null) { prevRdd.unpersist(blocking = false); prevRdd = null }
    // the key cache has its own monitor (lookup() holds it, not
    // `this`) — clear under THAT lock or a racing put corrupts the
    // non-thread-safe LinkedHashMap
    keyCache.synchronized(keyCache.clear())
  }

  // ---- per-key layer --------------------------------------------
  private case class KeyEntry(at: Long, schema: StructType, rows: Seq[Row])
  // bounded FIFO (the RuleTracer ring pattern): a long-running rule
  // doing point lookups over a high-cardinality key stream must not
  // grow driver heap without bound - eldest entries evict at capacity
  private val keyCache = new java.util.LinkedHashMap[String, KeyEntry]() {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, KeyEntry]): Boolean =
      size() > TtlCachedSource.MaxKeyEntries
  }

  def lookup(spark: SparkSession, fields: Seq[String],
             keys: Seq[String], values: Seq[Any]): DataFrame = {
    // every segment NUL-separates its elements AND carries its length,
    // so neither in-list commas (Seq("a,b") vs Seq("a","b")) nor
    // cross-segment shifts can make two distinct lookups share a key
    def seg(xs: Seq[String]): String =
      xs.length + ":" + xs.mkString("\u0000")
    val cacheKey = seg(fields) + "\u0001" + seg(keys) + "\u0001" +
      seg(values.map(String.valueOf))
    val now = System.currentTimeMillis()
    val hit = keyCache.synchronized(keyCache.get(cacheKey))
    if (hit != null && !expired(hit.at, now))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(hit.rows, 1), hit.schema)
    val fresh = inner match {
      case lc: LookupCapable => fetches.incrementAndGet(); lc.lookup(spark, fields, keys, values)
      case _ =>
        // any table source becomes lookup-capable through the wrapper:
        // point queries filter the TTL-cached snapshot (one backend
        // pull per TTL window, shared by every key)
        lookupByFilter(spark, fields, keys, values)
    }
    val rows = fresh.collect().toSeq
    if (rows.nonEmpty || cacheMissingKey)
      keyCache.synchronized(
        keyCache.put(cacheKey, KeyEntry(now, fresh.schema, rows)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), fresh.schema)
  }
}

object TtlCachedSource {
  /** Per-key cache capacity - point results are per-key dimension
    * rows, so this bounds driver heap at a few MB worst-case.
    */
  @volatile var MaxKeyEntries: Int = 10000
}
