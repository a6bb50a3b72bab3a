package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.9 — training-export utilities: deterministic epoch
  * shuffling and weighted priority sampling, both with full DuckDB
  * oracles (everything is hash-derived — no RNG state, so any engine
  * replays the exact selection).
  */
object ExportQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** Uniform-ish 32-bit int from a salted md5 of the doc id — the
    * shared randomness for shuffle/sampling (same construction the
    * stratified sampler uses; DuckDB replays it with
    * ('0x'||substr(md5(...),1,8))::UBIGINT).
    */
  private def hash32(salt: String): org.apache.spark.sql.Column =
    graft.functions.TextHashFunctions.hex_slice_long(
      md5(concat(lit(salt), col("doc_id").cast("string"))), 1)

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // epoch shuffle: every doc gets a global 1-based position in a
    // deterministic pseudorandom permutation (salt = epoch tag).
    // Global rank WITHOUT a global sort: range-partition by the
    // shuffle key, rank within partitions, add broadcast partition
    // offsets — the q_win_count technique. Rank is independent of
    // where the range boundaries land, so the result is stable at any
    // core count.
    "q_shuffle_epoch" -> ((s, d) => {
      val keyed = docs(s, d).select(col("doc_id"), hash32("epoch7:").as("k"))
      val parts = keyed.repartitionByRange(col("k"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint(true)
      val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      val offsets = counts.as("a")
        .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"))
        .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("off"))
      val local = Window.partitionBy(col("pid")).orderBy(col("k"), col("doc_id"))
      parts.join(broadcast(offsets), "pid")
        .withColumn("pos", row_number().over(local).cast("long") + col("off"))
        .select(col("doc_id"), col("pos"))
    }),

    // weighted priority sampling (Duffield, Lund & Thorup 2007): per
    // source keep the 3 docs with highest priority w/u, w = n_chars,
    // u = (hash32+1)/2^32. Longer docs are proportionally likelier
    // but any doc can win — and the draw replays exactly from the
    // hash, so resuming a 100 TB export never re-samples differently.
    "q_sample_weighted" -> ((s, d) => {
      val pri = col("n_chars").cast("double") / (hash32("ws:") + 1L).cast("double")
      val w = Window.partitionBy(col("source"))
        .orderBy(col("pri").desc, col("doc_id"))
      docs(s, d).select(col("doc_id"), col("source"), col("n_chars"), pri.as("pri"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("source"), col("rk").cast("long").as("rk"), col("doc_id"))
    }),

    // z-order (Morton) locality audit over the two lineitem part/supp
    // keys: bucket rows by the top 4 bits of their interleaved 8-bit
    // grid coordinates and report each bucket's per-column min/max —
    // the row-group spans a z-clustered parquet write would carry,
    // i.e. the multi-column data-skipping evidence. One tiny stats
    // agg broadcast back + one partial-agg'd bucket shuffle; FULL
    // oracle (grid floor-division and bit interleave are
    // engine-exact integer/IEEE arithmetic).
    "q_layout_zorder" -> ((s, d) =>
      graft.operators.Layout.zorderAudit(
        Tables(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey")),
        Seq("l_partkey", "l_suppkey"), bits = 8, bucketBits = 4))
  )

  val oracle: Map[String, String] = Map(
    "q_shuffle_epoch" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY
        |    ('0x' || substring(md5('epoch7:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT,
        |    doc_id) AS pos
        |FROM documents""".stripMargin,
    "q_sample_weighted" ->
      """WITH p AS (
        |  SELECT doc_id, source,
        |    CAST(n_chars AS DOUBLE) /
        |      (('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT + 1)
        |      AS pri
        |  FROM documents)
        |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id) AS rk
        |  FROM p)
        |WHERE rk <= 3""".stripMargin,
    "q_layout_zorder" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"((gp >> $i) & 1) * ${1L << (2 * i)}",
        s"((gs >> $i) & 1) * ${1L << (2 * i + 1)}")).mkString(" + ")
      s"""WITH s AS (SELECT
         |    min(l_partkey) AS lo_p, max(l_partkey) AS hi_p,
         |    min(l_suppkey) AS lo_s, max(l_suppkey) AS hi_s
         |  FROM lineitem),
         |g AS (SELECT l_partkey, l_suppkey,
         |    CAST(floor((CAST(l_partkey - lo_p AS DOUBLE) * 255.0)
         |      / (CASE WHEN hi_p > lo_p THEN CAST(hi_p - lo_p AS DOUBLE)
         |              ELSE 1.0 END)) AS BIGINT) AS gp,
         |    CAST(floor((CAST(l_suppkey - lo_s AS DOUBLE) * 255.0)
         |      / (CASE WHEN hi_s > lo_s THEN CAST(hi_s - lo_s AS DOUBLE)
         |              ELSE 1.0 END)) AS BIGINT) AS gs
         |  FROM lineitem CROSS JOIN s),
         |z AS (SELECT l_partkey, l_suppkey, ($terms) AS zval FROM g)
         |SELECT (zval >> 12) AS z_bucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(l_partkey) AS l_partkey_min, max(l_partkey) AS l_partkey_max,
         |  min(l_suppkey) AS l_suppkey_min, max(l_suppkey) AS l_suppkey_max
         |FROM z GROUP BY 1""".stripMargin
    }
  )
}
