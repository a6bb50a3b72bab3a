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
}
