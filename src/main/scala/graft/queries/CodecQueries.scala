package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables
import graft.sources.Codecs

/** Payload-codec queries (SURVEY §2.6 formats; reference
  * internal/converter/delimited, internal/converter/urlencoded):
  * encode real table rows into wire frames and decode them back
  * through the declared schema. The oracle is round-trip identity —
  * the decoded output must equal a plain projection of the input —
  * which pins both directions of each codec against DuckDB.
  * Percent-escaping specifics are pinned separately in
  * SourcesSinksSpec (DuckDB 1.0 has no url_encode to oracle them).
  */
object CodecQueries {

  val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_codec_delimited" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      val frames = li.select(Codecs.encodeDelimited(Seq(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity").cast("double")), "|").as("frame"))
      frames
        .select(Codecs.decodeDelimited(col("frame"),
          StructType.fromDDL("okey BIGINT, line BIGINT, rflag STRING, qty DOUBLE"),
          "|").as("m"))
        .select(col("m.*"))
    }),

    "q_codec_urlencoded" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val frames = ev.select(Codecs.encodeUrlencoded(Seq(
        "user" -> col("user_id"),
        "etype" -> col("event_type"),
        "v" -> round(col("value"), 2))).as("frame"))
      frames
        .select(Codecs.decodeUrlencoded(col("frame"),
          StructType.fromDDL("user BIGINT, etype STRING, v DOUBLE")).as("m"))
        .select(col("m.*"))
    })
  )

  val oracle: Map[String, String] = Map(
    // encode -> decode is lossless, so the oracle is the projection the
    // round trip must reproduce
    "q_codec_delimited" ->
      """SELECT l_orderkey AS okey, CAST(l_linenumber AS BIGINT) AS line,
        |  l_returnflag AS rflag, CAST(l_quantity AS DOUBLE) AS qty
        |FROM lineitem""".stripMargin,
    "q_codec_urlencoded" ->
      """SELECT user_id AS "user", event_type AS etype, round(value, 2) AS v
        |FROM events""".stripMargin
  )
}
