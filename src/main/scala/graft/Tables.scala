package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table loader. Tables are the driver-generated TPC-H-ish star
  * schema (see /root/repo/TESTDATA.md). At cluster scale the same
  * parquet layout is read from distributed storage — nothing here is
  * local-mode specific; filters/projections push down to the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which parquet-mr maps to
    // INT64 and Spark rejects by default; read nanos as long and convert
    // to a microsecond timestamp (generator emits µs-aligned values, so
    // this is lossless and matches DuckDB's reading of the same file).
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val df =
      if (name == "events" && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    // Generators that emit naive (not UTC-adjusted) parquet timestamps
    // surface as TIMESTAMP_NTZ under Spark's default inference; all query
    // semantics (and the DuckDB oracle, whose session runs in UTC) treat
    // them as instants, so normalize to TIMESTAMP. With the session in
    // UTC the wall-clock is preserved exactly — same micros, same oracle
    // rendering — and sessions that already disable
    // spark.sql.parquet.inferTimestampNTZ.enabled never hit this branch.
    df.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** Register every table as a temp view (for spark.sql rules). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
