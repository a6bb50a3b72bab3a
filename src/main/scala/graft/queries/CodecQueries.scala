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
    // the oracle performs the same encode -> parse -> cast round trip
    // (string build + split per row), so the bench comparison charges
    // both engines the same per-row work
    "q_codec_delimited" ->
      """WITH f AS (
        |  SELECT l_orderkey || '|' || l_linenumber || '|' || l_returnflag
        |    || '|' || CAST(l_quantity AS DOUBLE) AS frame
        |  FROM lineitem)
        |SELECT CAST(string_split(frame, '|')[1] AS BIGINT) AS okey,
        |  CAST(string_split(frame, '|')[2] AS BIGINT) AS line,
        |  string_split(frame, '|')[3] AS rflag,
        |  CAST(string_split(frame, '|')[4] AS DOUBLE) AS qty
        |FROM f""".stripMargin,
    // events' values are URL-safe, so DuckDB (no url_encode/url_decode
    // in 1.0) parses the same frames with regexp_extract
    "q_codec_urlencoded" ->
      """WITH f AS (
        |  SELECT 'user=' || user_id || '&etype=' || event_type
        |    || '&v=' || round(value, 2) AS frame
        |  FROM events)
        |SELECT CAST(regexp_extract(frame, 'user=([^&]*)', 1) AS BIGINT) AS "user",
        |  regexp_extract(frame, 'etype=([^&]*)', 1) AS etype,
        |  CAST(regexp_extract(frame, 'v=([^&]*)', 1) AS DOUBLE) AS v
        |FROM f""".stripMargin
  )
}
