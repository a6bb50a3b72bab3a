package graft.sources

import java.nio.charset.StandardCharsets

/** OAuth token flow for the HTTP-based source/sink clients (reference
  * internal/io/http/client.go — AccessTokenConf/RefreshTokenConf at
  * :61-73, auth at :254-265, refresh at :280-295, the Send-time
  * renewal check at :237-249):
  *
  *  - on first use, POST `oauth.access.url` with the JSON
  *    `oauth.access.body` and `oauth.access.headers`; the response's
  *    JSON object becomes the token map;
  *  - `{{.name}}` templates (the reference's Go-template form; bare
  *    `{{name}}` also accepted) substitute token values into the main
  *    request headers and into the refresh request's headers/body;
  *  - after each send, when twice the elapsed time exceeds
  *    `oauth.access.expire` seconds, the token renews via
  *    `oauth.refresh.url` (templated headers/body), or by re-running
  *    the access flow when no refresh conf is set — the same
  *    `2 × elapsed > expire` rule the reference applies.
  *
  * Thread-safe: a sink publishing from several partitions on one JVM
  * shares one renewal at a time.
  */
final class OAuthTokenManager(options: Map[String, String]) extends Serializable {
  private val accessUrl = options("oauth.access.url")
  private val accessBody = options.getOrElse("oauth.access.body", "")
  private val accessHeaders = OAuthTokenManager.headerMap(options.get("oauth.access.headers"))
  private val expireSeconds = options.getOrElse("oauth.access.expire", "0").toInt
  private val refreshConf: Option[(String, Map[String, String], String)] =
    options.get("oauth.refresh.url").map(u =>
      (u, OAuthTokenManager.headerMap(options.get("oauth.refresh.headers")),
        options.getOrElse("oauth.refresh.body", "")))

  @transient @volatile private var tokens: Map[String, String] = null
  @transient @volatile private var lastUpdateMs = 0L

  /** Substitute `{{.k}}` / `{{k}}` with token values; unknown keys
    * render empty (the Go template's zero value).
    */
  def render(tpl: String): String = {
    val tk = if (tokens == null) Map.empty[String, String] else tokens
    """\{\{\s*\.?([A-Za-z_][A-Za-z0-9_]*)\s*\}\}""".r
      .replaceAllIn(tpl, m =>
        scala.util.matching.Regex.quoteReplacement(tk.getOrElse(m.group(1), "")))
  }

  /** Template every header value with the current token map. */
  def headers(base: Map[String, String]): Map[String, String] = {
    ensure()
    base.map { case (k, v) => k -> render(v) }
  }

  /** Fetch the initial access token if none is held yet. */
  def ensure(): Unit = synchronized { if (tokens == null) auth() }

  /** The reference's post-send check: renew when the token has lived
    * past half its expiry. A failed renewal is logged and swallowed —
    * the send it trails already succeeded, so failing it would force a
    * duplicate re-send; the old token is kept and renewal retries on
    * the next send (the reference's warn-and-continue in
    * client.go:240-247).
    */
  def afterSend(): Unit = synchronized {
    if (tokens != null && expireSeconds > 0 &&
      (System.currentTimeMillis() - lastUpdateMs) / 1000.0 * 2 > expireSeconds) {
      try refreshConf match {
        case Some((url, hs, body)) =>
          update(OAuthTokenManager.postJson(url, hs.map { case (k, v) => k -> render(v) },
            render(body)))
        case None => auth() // no refresh conf: re-run the access flow
      } catch {
        case e: Exception =>
          System.err.println(s"[oauth] token refresh failed (keeping current token): ${e.getMessage}")
      }
    }
  }

  private def auth(): Unit =
    update(OAuthTokenManager.postJson(accessUrl, accessHeaders, accessBody))

  private def update(tokenJson: String): Unit = {
    tokens = OAuthTokenManager.jsonToStringMap(tokenJson)
    lastUpdateMs = System.currentTimeMillis()
  }
}

object OAuthTokenManager {
  /** Present only when the access-token url prop is set — the same
    * "empty url disables oauth" rule as the reference's InitConf.
    */
  def fromOptions(options: Map[String, String]): Option[OAuthTokenManager] =
    options.get("oauth.access.url").filter(_.nonEmpty)
      .map(_ => new OAuthTokenManager(options))

  /** A headers prop is a JSON object of string values. */
  def headerMap(json: Option[String]): Map[String, String] =
    json.filter(_.trim.nonEmpty).map(jsonToStringMap).getOrElse(Map.empty)

  private[sources] def jsonToStringMap(json: String): Map[String, String] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(json) match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> v
        case (k, JInt(v)) => k -> v.toString
        case (k, JLong(v)) => k -> v.toString
        case (k, JDouble(v)) => k -> v.toString
        case (k, JBool(v)) => k -> v.toString
      }.toMap
      case other => throw new IllegalArgumentException(
        s"expected a JSON object, got ${other.getClass.getSimpleName}")
    }
  }

  /** One POST with a JSON body; non-2xx raises with the response body. */
  private[sources] def postJson(url: String, headers: Map[String, String],
                                body: String): String = {
    val c = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      c.setConnectTimeout(5000)
      c.setReadTimeout(5000)
      c.setRequestMethod("POST")
      c.setRequestProperty("Content-Type", "application/json")
      headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
      if (body.nonEmpty) {
        c.setDoOutput(true)
        c.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
      }
      val code = c.getResponseCode
      if (code / 100 != 2) {
        val err = Option(c.getErrorStream)
          .map(s => new String(s.readAllBytes(), StandardCharsets.UTF_8)).getOrElse("")
        throw new java.io.IOException(s"oauth token request failed: HTTP $code $err")
      }
      new String(c.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    } finally c.disconnect()
  }
}
