package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** EdgeX Foundry message-bus envelope codec (the public
  * go-mod-messaging / go-mod-core-contracts JSON shapes), so the
  * TYPE="edgex" connector rides graft's REAL mqtt/redis transports:
  * the message bus is MQTT or redis pub/sub carrying a JSON
  * `MessageEnvelope` whose payload is a `dtos.Event` (or an
  * `AddEventRequest` wrapping one).
  *
  * Reference behavior: internal/io/edgex/source.go:107-201 (subscribe,
  * flatten readings to {resourceName: typed value}), :203-280
  * (per-valueType conversion), internal/io/edgex/sink.go:470-510
  * (wrap rows into an Event and publish the envelope).
  */
object Edgex {

  /** Decode one message-bus envelope to the flattened reading object
    * the reference's source ingests: `{resourceName: typed value, ...}`
    * as a compact JSON string (which then flows through the standard
    * json decode to the declared schema). None when the event carries
    * no readings (the reference ignores those).
    *
    * The envelope `payload` is accepted in the three forms seen on real
    * buses: base64 of the event JSON (Go `[]byte` marshalling), the
    * event JSON inline as a string, or an inline JSON object.
    */
  def decodeEnvelope(envelopeJson: String, messageType: String = "event"): Option[String] = {
    val env = JsonMethods.parse(envelopeJson)
    val payload = env \ "payload" match {
      case JString(s) =>
        val text =
          try new String(java.util.Base64.getDecoder.decode(s), java.nio.charset.StandardCharsets.UTF_8)
          catch { case _: IllegalArgumentException => s }
        JsonMethods.parse(text)
      case o: JObject => o
      case other => throw new IllegalArgumentException(s"edgex: envelope has no payload: $other")
    }
    val event = messageType.toLowerCase match {
      case "request" => payload \ "event" // AddEventRequest wraps the Event
      case _ => payload
    }
    eventToFlat(event)
  }

  /** dtos.Event → flat {resourceName: typed value} JSON, or None if no
    * usable readings (source.go:160-199).
    */
  private def eventToFlat(event: JValue): Option[String] = {
    val readings = event \ "readings" match {
      case JArray(rs) => rs
      case _ => Nil
    }
    val fields = readings.flatMap { r =>
      r \ "resourceName" match {
        case JString(name) if name.nonEmpty => Some(name -> readingValue(r))
        case _ => None // reference warns and skips nameless readings
      }
    }
    if (fields.isEmpty) None
    else Some(JsonMethods.compact(JsonMethods.render(JObject(fields))))
  }

  /** Per-valueType conversion of a BaseReading's string `value`
    * (source.go getValue, :203-280). Unknown types fall back to the
    * string value, same as the reference.
    */
  private def readingValue(r: JValue): JValue = {
    val valueType = r \ "valueType" match { case JString(t) => t; case _ => "" }
    def str = r \ "value" match { case JString(v) => v; case other => JsonMethods.compact(JsonMethods.render(other)) }
    valueType match {
      case "Bool" => JBool(str.toBoolean)
      case "Int8" | "Int16" | "Int32" | "Int64" |
           "Uint8" | "Uint16" | "Uint32" => JLong(str.toLong)
      case "Uint64" => JInt(BigInt(str)) // may exceed Long
      case "Float32" | "Float64" => JDouble(str.toDouble)
      case "String" => JString(str)
      case t if t.endsWith("Array") => JsonMethods.parse(str)
      case "Binary" => r \ "binaryValue" // base64 string rides through
      case "Object" => r \ "objectValue"
      case _ => JString(str)
    }
  }

  /** Sink side: wrap one row (a JSON object of column → value) into a
    * dtos.Event envelope ready to publish on the bus (sink.go:470-510).
    * valueType is inferred from the JSON type, the same inference the
    * reference applies to Go values.
    */
  def envelope(rowJson: String, deviceName: String = "graft",
               profileName: String = "graftProfile", sourceName: String = "graftSource",
               messageType: String = "event"): String = {
    val row = JsonMethods.parse(rowJson) match {
      case o: JObject => o
      case other => throw new IllegalArgumentException(s"edgex sink row must be a JSON object, got $other")
    }
    val originNs = System.currentTimeMillis() * 1000000L
    val readings = JArray(row.obj.map { case (name, v) =>
      val (valueType, valueFields) = v match {
        case JBool(_) => "Bool" -> List(JField("value", JString(compactScalar(v))))
        case JInt(_) | JLong(_) => "Int64" -> List(JField("value", JString(compactScalar(v))))
        case JDouble(_) | JDecimal(_) => "Float64" -> List(JField("value", JString(compactScalar(v))))
        case JString(_) => "String" -> List(JField("value", JString(compactScalar(v))))
        case JArray(xs) =>
          val t = xs.headOption match {
            case Some(JBool(_)) => "BoolArray"
            case Some(JInt(_) | JLong(_)) => "Int64Array"
            case Some(JDouble(_) | JDecimal(_)) => "Float64Array"
            case _ => "StringArray"
          }
          t -> List(JField("value", JString(JsonMethods.compact(JsonMethods.render(v)))))
        case obj => "Object" -> List(JField("objectValue", obj))
      }
      JObject(List(
        JField("id", JString(java.util.UUID.randomUUID().toString)),
        JField("origin", JLong(originNs)),
        JField("deviceName", JString(deviceName)),
        JField("resourceName", JString(name)),
        JField("profileName", JString(profileName)),
        JField("valueType", JString(valueType))) ++ valueFields)
    })
    val event = JObject(List(
      JField("apiVersion", JString("v3")),
      JField("id", JString(java.util.UUID.randomUUID().toString)),
      JField("deviceName", JString(deviceName)),
      JField("profileName", JString(profileName)),
      JField("sourceName", JString(sourceName)),
      JField("origin", JLong(originNs)),
      JField("readings", readings)))
    val payload = messageType.toLowerCase match {
      case "request" => JObject(List(JField("apiVersion", JString("v3")), JField("event", event)))
      case _ => event
    }
    val payloadB64 = java.util.Base64.getEncoder.encodeToString(
      JsonMethods.compact(JsonMethods.render(payload))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    JsonMethods.compact(JsonMethods.render(JObject(List(
      JField("apiVersion", JString("v3")),
      JField("correlationID", JString(java.util.UUID.randomUUID().toString)),
      JField("contentType", JString("application/json")),
      JField("errorCode", JInt(0)),
      JField("payload", JString(payloadB64))))))
  }

  private def compactScalar(v: JValue): String = v match {
    case JString(s) => s
    case other => JsonMethods.compact(JsonMethods.render(other))
  }
}
