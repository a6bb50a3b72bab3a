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
    val out = Seq(
      "minhash_internal" -> time(() =>
        Dedup.minhashPairs(docs, "text", "doc_id", minEstJaccard = 0.5)),
      "minhash_portable" -> time(() =>
        Dedup.minhashPairsPortable(docs, "text", "doc_id", minEstJaccard = 0.5)),
      "simhash_internal" -> time(() =>
        Dedup.simhashPairs(docs, "text", "doc_id")),
      "simhash_portable" -> time(() =>
        Dedup.simhashPairsPortable(docs, "text", "doc_id")))
    println(out.map { case (k, v) => f""""$k":$v%.2f""" }
      .mkString(s"""{"sfDir":"$sfDir",""", ",", "}"))
    spark.stop()
  }
}
