package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Payload codecs beyond JSON — the reference's message converters
  * (lf-edge/ekuiper internal/converter/delimited/converter.go,
  * internal/converter/urlencoded): decode a raw frame string into the
  * declared schema, and encode a result row back into a frame.
  *
  * Everything is pure Column expressions (split / str_to_map /
  * url_decode / concat_ws) — codegen'd, fully distributed, no UDFs;
  * a 100 TB decode is just a projection over the scan.
  */
object Codecs {

  val formats: Set[String] = Set("json", "delimited", "urlencoded", "protobuf", "avro")

  /** Decode a delimited frame ("v1,v2,v3") into the declared schema:
    * positional fields, each cast to its declared type. Reference:
    * internal/converter/delimited (DELIMITER property, default ",").
    */
  def decodeDelimited(frame: Column, schema: StructType, delimiter: String = ","): Column = {
    // try_cast + empty→null: the reference's converter tolerates short
    // or malformed fields (and ANSI mode would otherwise throw on them)
    // literal byte-scan split (codegen kernel) — same semantics as
    // split(frame, Pattern.quote(delimiter), -1) without the regex
    // engine in the per-row hot path. An empty delimiter keeps the
    // pre-kernel zero-width-regex behavior (split into single chars)
    // rather than the kernel's whole-string fallback.
    val parts =
      if (delimiter.isEmpty) split(frame, "")
      else graft.functions.DelimitedKernels.literal_split(frame, delimiter)
    struct(schema.fields.zipWithIndex.map { case (f, i) =>
      nullif(try_element_at(parts, lit(i + 1)), lit(""))
        .try_cast(f.dataType.sql).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Encode columns into one delimited frame (nulls render empty).
    * Each column is coalesced to "" BEFORE concat_ws — concat_ws drops
    * null arguments entirely (value and separator), which would shift
    * every later field one position left on decode.
    */
  def encodeDelimited(cols: Seq[Column], delimiter: String = ","): Column =
    concat_ws(delimiter, cols.map(c => coalesce(c.cast("string"), lit(""))): _*)

  /** Decode an application/x-www-form-urlencoded frame
    * ("a=1&b=x%20y") into the declared schema: percent-decoded keys
    * and values, fields matched by name, cast to declared types.
    * Missing keys decode to null (try_element_at — ANSI-safe).
    * Reference: internal/converter/urlencoded.
    */
  def decodeUrlencoded(frame: Column, schema: StructType): Column = {
    // keys are matched in their ENCODED form (computed once at plan
    // time) via per-field regexp_extract — no str_to_map, which throws
    // on duplicate keys (mapKeyDedupPolicy=EXCEPTION), and no
    // per-element HOF lambda (those run interpreted). First occurrence
    // wins; missing or empty values null out; invalid percent escapes
    // null out via try_url_decode rather than killing the query.
    struct(schema.fields.map { f =>
      val encKey = java.util.regex.Pattern.quote(
        java.net.URLEncoder.encode(f.name, "UTF-8"))
      call_function("try_url_decode",
        nullif(regexp_extract(frame, s"(?:^|&)$encKey=([^&]*)", 1), lit("")))
        .try_cast(f.dataType.sql).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Encode (name, value) columns as a urlencoded frame; null values
    * are omitted, like the reference's converter.
    */
  def encodeUrlencoded(cols: Seq[(String, Column)]): Column =
    concat_ws("&", cols.map { case (n, c) =>
      when(c.isNotNull, concat(lit(n), lit("="), url_encode(c.cast("string"))))
    }: _*)

  /** Frame-string → typed-struct decode for the given format.
    * Protobuf frames (binary wire format, graft.functions.ProtobufLite)
    * ride the string transport base64-encoded.
    */
  def decode(frame: Column, schema: StructType, format: String,
             delimiter: String = ","): Column = format.toLowerCase match {
    case "json" => from_json(frame, schema)
    case "delimited" => decodeDelimited(frame, schema, delimiter)
    case "urlencoded" => decodeUrlencoded(frame, schema)
    case "protobuf" =>
      graft.functions.ProtobufFunctions.proto_decode(unbase64(frame), schema)
    case "avro" =>
      graft.functions.AvroFunctions.avro_decode(unbase64(frame), schema)
    case other => throw new IllegalArgumentException(
      s"unknown payload format '$other' (expected one of ${formats.mkString(", ")})")
  }

  /** Columns → frame-string encode for the given format. */
  def encode(cols: Seq[(String, Column)], format: String,
             delimiter: String = ","): Column = format.toLowerCase match {
    case "json" => to_json(struct(cols.map { case (n, c) => c.as(n) }: _*))
    case "delimited" => encodeDelimited(cols.map(_._2), delimiter)
    case "urlencoded" => encodeUrlencoded(cols)
    case "protobuf" => base64(graft.functions.ProtobufFunctions.proto_encode(
      struct(cols.map { case (n, c) => c.as(n) }: _*)))
    case "avro" => base64(graft.functions.AvroFunctions.avro_encode(
      struct(cols.map { case (n, c) => c.as(n) }: _*)))
    case other => throw new IllegalArgumentException(
      s"unknown payload format '$other' (expected one of ${formats.mkString(", ")})")
  }
}
