package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the two dedup kernel surfaces side by side (SURVEY §6):
  * the PRODUCTION splitmix64/xxhash family (minhashPairs/simhashPairs
  * — fastest, not SQL-replayable) vs the PORTABLE md5+LCG family
  * (minhashPairsPortable/simhashPairsPortable — what the oracle-backed
  * query surface runs since r18, so Bench reports the portable cost).
  * Keeps the production-path number visible next to the oracle-path
  * number so a future round doesn't chase the delta as a regression.
  *
  * Usage: runMain graft.KernelBench [sfDir] — median of 3, noop sink.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(mk: () => DataFrame): Double = median((1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    })

    import graft.operators.Dedup
    // untimed warm-up: the first pipeline otherwise pays JVM/codegen/
    // parquet-footer startup and the comparison order would bias it
    Dedup.minhashPairs(docs, "text", "doc_id", minEstJaccard = 0.5)
      .write.format("noop").mode("overwrite").save()
    // k pinned EQUAL on both minhash paths (the operators' defaults
    // differ: internal k=64, portable k=32 — comparing those would
    // measure signature length, not kernel cost); k=32 matches what
    // the oracle-backed query surface runs
    val out = Seq(
      "minhash_internal_k32" -> time(() =>
        Dedup.minhashPairs(docs, "text", "doc_id", k = 32, minEstJaccard = 0.5)),
      "minhash_portable_k32" -> time(() =>
        Dedup.minhashPairsPortable(docs, "text", "doc_id", k = 32, minEstJaccard = 0.5)),
      "minhash_internal_k64_default" -> time(() =>
        Dedup.minhashPairs(docs, "text", "doc_id", minEstJaccard = 0.5)),
      "simhash_internal" -> time(() =>
        Dedup.simhashPairs(docs, "text", "doc_id")),
      "simhash_portable" -> time(() =>
        Dedup.simhashPairsPortable(docs, "text", "doc_id")))
    // Locale.ROOT: the f"" interpolator is locale-sensitive and would
    // print a decimal COMMA on non-English JVMs — invalid JSON
    println(out.map { case (k, v) =>
        s""""$k":${"%.2f".formatLocal(java.util.Locale.ROOT, v)}""" }
      .mkString(s"""{"sfDir":"$sfDir",""", ",", "}"))
    spark.stop()
  }
}
