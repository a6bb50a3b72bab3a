package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Text-analysis operator contracts (SURVEY §2.9). */
class TextOpsSpec extends SparkSuite {

  test("codegen langId agrees with the HOF reference on real documents") {
    val docs = Tables(spark, sf, "documents")
    val diff = docs.select(
      TextOps.langId(col("text")).as("a"),
      TextOps.langIdReference(col("text")).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(diff == 0, "kernel and reference langId diverge")
  }

  test("quality score stays in [0,1] and rewards clean English text") {
    val docs = Tables(spark, sf, "documents")
    val qs = docs.select(TextOps.qualityScore(col("text")).as("q"))
    assert(qs.where(col("q") < 0 || col("q") > 1).count() == 0)
    val clean = spark.sql(
      "SELECT 'the quick brown fox jumps over the lazy dog and it is fine that way for all of the animals in the field today' AS text")
    val junk = spark.sql("SELECT '###!!! @@@@ ;;; ^^^ %%% $$$ !!!' AS text")
    val qClean = clean.select(TextOps.qualityScore(col("text"))).first().getDouble(0)
    val qJunk = junk.select(TextOps.qualityScore(col("text"))).first().getDouble(0)
    assert(qClean > qJunk + 0.3, s"clean=$qClean junk=$qJunk")
  }

  test("token counts: bpe proxy >= whitespace tokens on punctuated text") {
    val df = spark.sql("SELECT 'hello, world! it''s 42 degrees.' AS text")
    val r = df.select(TextOps.tokenCount(col("text")).as("ws"),
      TextOps.bpeTokenCount(col("text")).as("bpe")).first()
    assert(r.getLong(0) == 5)
    assert(r.getLong(1) > r.getLong(0))
  }
}
