package graft.streaming

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP webhook alert delivery — the reference POSTs alert payloads
  * to a configured webhook URL (webhook/alert.py; alert_manager.rs:
  * 180-238 wraps the send in retry). This is the production delivery
  * fn for [[AlertManager]]'s injected `deliver` slot: it POSTs the
  * alert as JSON and THROWS on any transport error or non-2xx
  * response, which is exactly the contract AlertManager's
  * retry/backoff + FIFO pending queue are built around — a down
  * channel delays alerts, never drops or reorders them. */
object Webhook {

  // RFC 8259-complete (control chars included): trace ids come from
  // arbitrary wire data, and a newline in one would make the webhook
  // POST body malformed JSON
  private def jstr(s: String): String = Json.str(s)

  /** Stable wire shape of one alert (the webhook/alert.py payload
    * fields, plus the correlation id when known). */
  def alertJson(a: AlertManager.Alert): String =
    "{\"pipeline\":" + jstr(a.pipeline) +
      ",\"kind\":" + jstr(a.kind.toString) +
      ",\"tier\":" + jstr(a.tier.toString) +
      ",\"at\":" + a.at +
      ",\"trace_id\":" + a.traceId.map(jstr).getOrElse("null") + "}"

  /** Deliver one alert to `url`. Throws on connect/read failure and
    * on any non-2xx status — callers (AlertManager via
    * Retry.withBackoff) own the retry policy. */
  def deliver(url: String, connectTimeoutMillis: Int = 2000,
      readTimeoutMillis: Int = 5000)(a: AlertManager.Alert): Unit = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMillis)
      conn.setReadTimeout(readTimeoutMillis)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      conn.setDoOutput(true)
      val body = alertJson(a).getBytes(UTF_8)
      conn.setFixedLengthStreamingMode(body.length)
      conn.getOutputStream.write(body)
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"webhook returned $code")
      // drain so the connection is reusable by the JVM's keep-alive pool
      val in = conn.getInputStream
      while (in.read() != -1) ()
      in.close()
    } finally conn.disconnect()
  }
}
