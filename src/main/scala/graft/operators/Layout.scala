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
}
