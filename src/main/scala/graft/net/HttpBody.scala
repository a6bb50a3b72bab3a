package graft.net

/** Request-body framing for the HTTP sink/pull surfaces (reference
  * internal/pkg/httpx/http.go:47-120 SendWithFormData): `bodyType`
  * selects the Content-Type and encoding. `formdata` renders a
  * from-scratch multipart/form-data body — the payload rides a file
  * part whose field name is the `fileFieldName` prop and whose
  * filename is the send-time millis (reference http.go:84), followed
  * by the configured `formData` scalar fields.
  */
object HttpBody {

  /** bodyType → Content-Type (reference io/http/client.go:104
    * bodyTypeMap). `none` sends no body at all; `formdata`'s real
    * header carries the per-request boundary.
    */
  val contentTypes: Map[String, String] = Map(
    "none" -> "",
    "text" -> "text/plain",
    "json" -> "application/json",
    "html" -> "text/html",
    "xml" -> "application/xml",
    "javascript" -> "application/javascript",
    "form" -> "application/x-www-form-urlencoded",
    "binary" -> "application/octet-stream",
    "formdata" -> "multipart/form-data")

  /** Reference client.go:143-149: GET/HEAD default to a bodiless
    * request, every other method posts JSON.
    */
  def defaultFor(method: String): String =
    if (method == "GET" || method == "HEAD") "none" else "json"

  /** Lower-cases and rejects unknown types on the first send, like the
    * reference's InitConf (client.go:151-155).
    */
  def validate(bodyType: String): String = {
    val bt = bodyType.toLowerCase
    require(contentTypes.contains(bt),
      s"invalid bodyType '$bodyType' (one of ${contentTypes.keys.toSeq.sorted.mkString("/")})")
    bt
  }

  /** Returns (contentType, bodyBytes); an empty content type means the
    * caller sets no Content-Type header ("none"). User-supplied
    * headers still override the returned type, like the reference's
    * header loop after the body switch (httpx/http.go:124-128).
    */
  def encode(bodyType: String, payload: Array[Byte], fileFieldName: String,
             formFields: Seq[(String, String)]): (String, Array[Byte]) =
    bodyType match {
      case "none" => ("", Array.emptyByteArray)
      case "formdata" =>
        val boundary = "graft-" + java.util.UUID.randomUUID().toString
        (s"multipart/form-data; boundary=$boundary",
          multipart(boundary, fileFieldName, payload, formFields))
      case bt => (contentTypes(bt), payload)
    }

  // Go mime/multipart's name/filename escaping (writer.go quoteEscaper)
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def multipart(boundary: String, fileField: String,
                        payload: Array[Byte],
                        fields: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // file part first, then the scalar fields — reference http.go:84-105
    w(s"--$boundary\r\n")
    w("Content-Disposition: form-data; name=\"" + esc(fileField) +
      "\"; filename=\"" + System.currentTimeMillis() + "\"\r\n")
    w("Content-Type: application/octet-stream\r\n\r\n")
    out.write(payload)
    w("\r\n")
    fields.foreach { case (k, v) =>
      w(s"--$boundary\r\n")
      w("Content-Disposition: form-data; name=\"" + esc(k) + "\"\r\n\r\n")
      w(v)
      w("\r\n")
    }
    w(s"--$boundary--\r\n")
    out.toByteArray
  }
}
