package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB regime: salted joins for
  * skewed keys and bucketed tables for shuffle-free co-located joins —
  * the two shuffle levers AQE cannot pull by itself (AQE splits skewed
  * *partitions* post-hoc; salting prevents the hot key from ever
  * landing in one task, and bucketing removes the join shuffle
  * entirely for repeated join keys).
  */
object Layout {

  /** Salted equi-join of a skewed fact table against a dimension:
    * the fact side gets a uniform salt in [0, saltFactor); the
    * dimension side is replicated once per salt value, so a hot key's
    * rows spread over `saltFactor` tasks instead of one. Exact same
    * result set as `fact.join(dim, keys)` — only the partitioning
    * changes.
    *
    * Only fact-preserving join types are legal: the dim side is
    * replicated saltFactor×, so right/full outer would emit each
    * unmatched dim row saltFactor times. Use the dim as the fact side
    * (or plain AQE skew handling) for those.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti only, not '$joinType': " +
        "the replicated dim side would duplicate unmatched dim rows under right/full outer")
    val salted = fact.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a table bucketed by the join key. Subsequent equi-joins of
    * two tables bucketed the same way compile WITHOUT an Exchange on
    * either side (asserted in LayoutSpec) — the cluster-native answer
    * to "this join happens every hour on the same key".
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Read a bucketed table back. */
  def readBucketed(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Sharded corpus export — the trainer-handoff step: write the
    * frame as exactly `shards` content-addressed parquet shards
    * (`shard=N/` directories), each internally ordered by the shard
    * sort key. Shard assignment is a pure function of the content
    * hash, so re-exports of a grown corpus keep unchanged rows in
    * the same shard (downstream caches stay warm), and
    * `maxRecordsPerFile` bounds every output file for the data
    * loader. One repartition on the shard id — the single shuffle an
    * export fundamentally needs — then files stream out of each
    * partition without a global sort.
    */
  def exportShards(df: DataFrame, outDir: String, contentCol: String,
                   shards: Int, maxRecordsPerFile: Int = 100000): Unit =
    df.withColumn("shard",
        pmod(xxhash64(col(contentCol)), lit(shards.toLong)).cast("int"))
      // range partitioning gives shard→task assignment that is 1:1 for
      // N distinct shard ids over N partitions; hash partitioning
      // would collide ids (balls-in-bins: ~1/e of tasks empty, others
      // carrying 2-3 shards) and halve write parallelism
      .repartitionByRange(shards, col("shard"))
      .sortWithinPartitions(col("shard"), xxhash64(col(contentCol)))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("shard")
      .parquet(outDir)

  /** Skew diagnosis: per-key row counts of the heaviest keys — what
    * you look at before deciding the salt factor.
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("rows"))
      .orderBy(col("rows").desc).limit(topN)

  /** Global 1-based positions in `orderCols` order WITHOUT a global
    * sort — the range-partition/offset technique q_win_count and the
    * epoch shuffle use, extracted as a reusable operator: range-
    * partition on the order key, count per partition (tiny), derive
    * each partition's offset from the counts, then local row_number +
    * offset. No stage ever sorts the whole table in one task, and the
    * result is independent of where the range boundaries land —
    * PROVIDED `orderCols` is a total order (add a unique tiebreaker
    * column if it is not; ties across a partition boundary would
    * otherwise split arbitrarily).
    *
    * localCheckpoint (not persist) pins the sampled range boundaries
    * so both passes see one layout; its blocks are reclaimed by the
    * ContextCleaner once unreferenced.
    */
  def zipWithGlobalIndex(df: DataFrame, orderCols: Seq[Column],
                         outCol: String = "pos"): DataFrame = {
    val parts = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("cnt"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("__off"))
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(orderCols: _*)
    parts.join(broadcast(offsets), "__pid")
      .withColumn(outCol, row_number().over(local).cast("long") + col("__off"))
      .drop("__pid", "__off")
  }

  /** CDC change-log compaction (last-write-wins snapshot): per id,
    * keep the row with the greatest (ts, seq) — seq breaks same-µs
    * ties into a total order — then drop ids whose final operation is
    * `deleteOp`. The upsert fold every lakehouse table maintenance
    * job runs; pairs with corpusDiff (which DETECTS changes) as the
    * operator that APPLIES them.
    *
    * Scale shape: ONE partial-agg'd shuffle on the id — max_by
    * combines map-side, so only one candidate row per id per
    * partition crosses the exchange; no window, no sort of the full
    * log. Returns the surviving rows with their original columns.
    */
  def compactLog(log: DataFrame, idCol: String, tsCol: String,
                 seqCol: String, opCol: String, deleteOp: String): DataFrame = {
    val payload = struct(log.columns.map(col): _*)
    log.groupBy(col(idCol).as("_cl_id"))
      .agg(max_by(payload, struct(col(tsCol), col(seqCol))).as("_cl_last"))
      // null-safe: a malformed record with op = null is NOT a delete —
      // a plain =!= would evaluate null and silently drop the id
      .where(!(col(s"_cl_last.$opCol") <=> deleteOp))
      .select(col("_cl_last.*"))
  }

  /** Map a value onto a `bits`-bit grid coordinate given its column
    * min/max: ⌊(x−lo)·(2ᵇ−1) / (hi−lo)⌋, with a guard only for the
    * degenerate hi == lo column. Pure double→floor arithmetic —
    * deterministic and engine-replayable (the products stay
    * integer-valued below 2⁵³, so the only rounding is the one IEEE
    * division both engines perform identically).
    */
  def zorderGrid(x: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"grid bits must be in [1,31], got $bits")
    val gmax = (1L << bits) - 1
    // the divide-by-zero guard triggers ONLY at hi == lo — clamping
    // with greatest(span, 1) would silently flatten the grid for any
    // column whose real range is below 1 (fractional scores, rates)
    val span = (hi - lo).cast("double")
    floor(((x - lo).cast("double") * gmax.toDouble) /
      when(span > 0, span).otherwise(lit(1.0))).cast("long")
  }

  /** Z-order (Morton) value: interleave the bits of the grid
    * coordinates — bit i of coordinate c lands at position i·n + c —
    * so rows close in EVERY dimension get close z-values. THE
    * multi-column clustering key for data skipping at scale: sort or
    * range-partition by it before a parquet write and the row-group
    * min/max stats prune predicates on ANY prefix-correlated subset
    * of the columns, not just the leading sort column. Plain shifted
    * sums of disjoint bits — whole-stage codegen, no UDF.
    */
  def zValue(grids: Seq[Column], bits: Int): Column = {
    val n = grids.size
    require(n >= 1, "zValue needs at least one coordinate")
    require(bits * n <= 62, s"bits*cols must fit a long, got $bits*$n")
    val terms = for { i <- 0 until bits; c <- grids.indices }
      yield shiftright(grids(c), i).bitwiseAND(lit(1L)) * lit(1L << (i * n + c))
    terms.reduce(_ + _)
  }

  /** Locality audit of a z-order layout: bucket rows by the top
    * `bucketBits` of their z-value and report, per bucket, the row
    * count and each clustering column's min/max — the spans a parquet
    * row-group footer would carry, i.e. the data-skipping evidence.
    * Narrow per-bucket spans (vs the global range) mean a predicate
    * on any clustered column prunes most buckets.
    *
    * Plan: one stats agg (tiny, broadcast back), one map-side
    * zval/bucket projection, one partial-agg'd shuffle on the bucket
    * id — the fact table is scanned twice and shuffled only as
    * ≤2^bucketBits aggregate rows.
    */
  /** The shared stats-pass + grid construction of zorderAudit /
    * zorderCluster: one min/max agg over the clustering columns
    * (tiny, broadcast back) and the per-column grid expressions —
    * kept in ONE place so a grid fix cannot diverge the two entry
    * points.
    */
  private def zorderGrids(df: DataFrame, cols: Seq[String],
                          bits: Int): (DataFrame, Seq[Column]) = {
    require(cols.nonEmpty, "zorder needs at least one column")
    // the broadcast stats row joins back onto df, so a same-named
    // input column would make every grid reference ambiguous
    val clash = cols.flatMap(c => Seq(s"lo_$c", s"hi_$c"))
      .intersect(df.columns.toSeq)
    require(clash.isEmpty,
      s"zorder reserves ${clash.mkString(", ")} — rename upstream")
    val stats = df.agg(
      min(col(cols.head)).as(s"lo_${cols.head}"),
      (max(col(cols.head)).as(s"hi_${cols.head}") +:
        cols.tail.flatMap(c =>
          Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c")))): _*)
    (stats, cols.map(c => zorderGrid(col(c), col(s"lo_$c"), col(s"hi_$c"), bits)))
  }

  def zorderAudit(df: DataFrame, cols: Seq[String], bits: Int = 8,
                  bucketBits: Int = 4): DataFrame = {
    require(cols.nonEmpty && bucketBits >= 1 && bucketBits <= bits * cols.size)
    require(!df.columns.contains("z_bucket"),
      "zorderAudit reserves z_bucket — rename upstream")
    val (stats, grids) = zorderGrids(df, cols, bits)
    df.crossJoin(broadcast(stats))
      .withColumn("z_bucket",
        shiftright(zValue(grids, bits), bits * cols.size - bucketBits))
      .groupBy(col("z_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** Physically cluster a frame by its z-value: range-partition on
    * the z key (so files cover disjoint z ranges) and sort within
    * each partition — the layout to write before serving multi-column
    * range predicates at 100 TB. The z columns' min/max come from one
    * stats pass; the clustering itself is the one range shuffle such
    * a rewrite fundamentally needs.
    */
  def zorderCluster(df: DataFrame, cols: Seq[String], bits: Int = 16,
                    partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("__z"),
      "zorderCluster reserves __z — rename upstream")
    val (stats, grids) = zorderGrids(df, cols, bits)
    val withZ = df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(grids, bits))
      .drop(cols.flatMap(c => Seq(s"lo_$c", s"hi_$c")): _*)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}
