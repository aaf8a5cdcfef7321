package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Real Prometheus pushgateway client behind [[Metrics.PushTarget]] —
  * the reference delegates to the prometheus simpleclient
  * `PushGateway` on a 20 s schedule with delete-on-exit
  * (services/impl/PushGatewayServiceImpl.kt:19-41); this speaks the
  * same public HTTP protocol directly:
  *
  *  - `PUT    /metrics/job/<job>{/<label>/<value>}*` — replace the
  *    group's metrics with the text exposition (format 0.0.4);
  *  - `DELETE /metrics/job/<job>{/<label>/<value>}*` — drop the group.
  *
  * Grouping-key segments are URL-path-encoded; a value containing `/`
  * (or empty) uses the gateway's base64 segment form
  * (`<label>@base64/<url-safe-b64>`), the documented escape for
  * path-hostile values. Segments are emitted in sorted key order —
  * the gateway treats the grouping key as a set, so ordering only
  * needs to be deterministic. Non-2xx responses raise; transient
  * failures retry under the reference's 5 × 2 backoff policy
  * ([[Retry]]). */
final class PushGatewayClient(baseUrl: String, job: String,
    policy: Retry.Policy = Retry.Policy(),
    sleeper: Long => Unit = Thread.sleep,
    timeoutMs: Long = 10000L) extends Metrics.PushTarget {

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(timeoutMs)).build()

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  private[pipeline] def pathFor(key: Map[String, String]): String = {
    val segs = key.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      if (v.contains("/") || v.isEmpty)
        // pushgateway convention: empty value = the single padding char
        // '=' (withoutPadding would emit an empty path segment — a
        // double slash the gateway can't route)
        Seq(s"${enc(k)}@base64",
          if (v.isEmpty) "="
          else java.util.Base64.getUrlEncoder.withoutPadding
            .encodeToString(v.getBytes(StandardCharsets.UTF_8)))
      else Seq(enc(k), enc(v))
    }
    (Seq("metrics", "job", enc(job)) ++ segs).mkString("/", "/", "")
  }

  private def send(req: HttpRequest): Unit = Retry.withRetry(policy, sleeper) {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"pushgateway ${req.method()} ${req.uri()} -> " +
          s"${resp.statusCode()}: ${resp.body().take(200)}")
  }

  override def push(key: Map[String, String], exposition: String): Unit =
    send(HttpRequest.newBuilder(URI.create(baseUrl + pathFor(key)))
      .timeout(Duration.ofMillis(timeoutMs))
      .header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
      .PUT(HttpRequest.BodyPublishers.ofString(exposition, StandardCharsets.UTF_8))
      .build())

  override def delete(key: Map[String, String]): Unit =
    send(HttpRequest.newBuilder(URI.create(baseUrl + pathFor(key)))
      .timeout(Duration.ofMillis(timeoutMs))
      .DELETE().build())
}
