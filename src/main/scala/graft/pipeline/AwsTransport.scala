package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 request signing + the minimal wire-protocol
  * clients the reference's control plane needs — S3 PutObject
  * (services/impl/S3ObjectServiceImpl.kt:24-47), DynamoDB UpdateItem
  * (DynamoDBExportStatusService.kt:30-136), SQS SendMessage and SNS
  * Publish (the completion fan-out, SQSMessagingService.kt /
  * SnsServiceImpl.kt). The reference wires the AWS SDK; the sandbox
  * has no AWS endpoint and no SDK jars, so these speak the SAME public
  * HTTP protocols directly (SigV4 + the documented REST/query/json
  * shapes) behind the repo's retrying seams — production swaps the
  * endpoint URL and real credentials, nothing else.
  *
  * The signer implements the published algorithm exactly (canonical
  * request → string-to-sign → HMAC key derivation chain → signature)
  * and is pinned against AWS's public SigV4 test vectors in
  * AwsTransportSpec. All requests here use SIGNED payloads
  * (x-amz-content-sha256 = hex sha256(body)) — no unsigned-payload or
  * chunked mode, which the export paths don't need.
  */
object AwsSigV4 {

  final case class Credentials(accessKeyId: String, secretAccessKey: String,
      sessionToken: Option[String] = None)

  private val AmzDate = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(ZoneOffset.UTC)
  private val ShortDate = DateTimeFormatter.ofPattern("yyyyMMdd")
    .withZone(ZoneOffset.UTC)

  def sha256Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  val EmptyPayloadHash: String = sha256Hex(Array.emptyByteArray)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Derived signing key: the documented four-step HMAC chain. */
  private[pipeline] def signingKey(secret: String, shortDate: String,
      region: String, service: String): Array[Byte] = {
    val kDate = hmac(("AWS4" + secret).getBytes(StandardCharsets.UTF_8), shortDate)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  /** RFC 3986 encoding with AWS's unreserved set (A-Za-z0-9-._~). */
  private[pipeline] def uriEncode(s: String, keepSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c) ||
          (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** The Authorization header value plus the headers the signature
    * covers. `headers` must already include `host`; this adds
    * `x-amz-date` (and `x-amz-security-token` under temporary
    * credentials) before canonicalizing. Query params are
    * (name, value) pairs, unencoded. */
  def sign(method: String, path: String, query: Seq[(String, String)],
      headers: Map[String, String], payloadSha256: String,
      region: String, service: String, creds: Credentials,
      now: Instant): Map[String, String] = {
    val amzDate = AmzDate.format(now)
    val shortDate = ShortDate.format(now)
    val allHeaders = headers ++ Map("x-amz-date" -> amzDate) ++
      creds.sessionToken.map("x-amz-security-token" -> _)

    val canonicalQuery = query
      .map { case (k, v) => uriEncode(k, keepSlash = false) ->
        uriEncode(v, keepSlash = false) }
      .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val lower = allHeaders.map { case (k, v) => k.toLowerCase -> v.trim }
    val signedHeaderNames = lower.keys.toSeq.sorted
    val canonicalHeaders = signedHeaderNames
      .map(h => s"$h:${lower(h)}\n").mkString
    val signedHeaders = signedHeaderNames.mkString(";")
    val canonicalRequest = Seq(method, uriEncode(path, keepSlash = true),
      canonicalQuery, canonicalHeaders, signedHeaders, payloadSha256)
      .mkString("\n")

    val scope = s"$shortDate/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8)))
      .mkString("\n")
    val signature = hmac(
      signingKey(creds.secretAccessKey, shortDate, region, service),
      stringToSign).map("%02x".format(_)).mkString

    allHeaders - "host" + ("Authorization" ->
      (s"AWS4-HMAC-SHA256 Credential=${creds.accessKeyId}/$scope, " +
        s"SignedHeaders=$signedHeaders, Signature=$signature"))
  }
}

/** Signed HTTP transport shared by the AWS-shaped clients: builds the
  * request, signs it, sends it, retries transient failures under the
  * reference's 5 × 2 policy, and raises on non-2xx. The clock is
  * injectable so specs sign deterministically. */
final class AwsHttpTransport(endpoint: String, region: String,
    creds: AwsSigV4.Credentials,
    policy: Retry.Policy = Retry.Policy(),
    sleeper: Long => Unit = Thread.sleep,
    clock: () => Instant = () => Instant.now()) {

  private val client = HttpClient.newHttpClient()
  private val host = URI.create(endpoint).getAuthority

  def request(method: String, path: String, query: Seq[(String, String)],
      extraHeaders: Map[String, String], body: Array[Byte],
      service: String): String = Retry.withRetry(policy, sleeper) {
    val payloadHash = AwsSigV4.sha256Hex(body)
    val signed = AwsSigV4.sign(method, path, query,
      extraHeaders ++ Map("host" -> host,
        "x-amz-content-sha256" -> payloadHash),
      payloadHash, region, service, creds, clock())
    val qs =
      if (query.isEmpty) ""
      else query.map { case (k, v) =>
        s"${AwsSigV4.uriEncode(k, keepSlash = false)}=${AwsSigV4.uriEncode(v, keepSlash = false)}"
      }.mkString("?", "&", "")
    // wire path must BE the signed canonical path: build the URI from
    // the same uriEncode the canonical request uses, or keys containing
    // space/'%'/'#'/'?' either break URI.create or sign a different
    // path than the one sent (SignatureDoesNotMatch at the endpoint)
    var b = HttpRequest.newBuilder(
      URI.create(endpoint + AwsSigV4.uriEncode(path, keepSlash = true) + qs))
    signed.foreach { case (k, v) =>
      if (!k.equalsIgnoreCase("content-length")) b = b.header(k, v)
    }
    b = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofByteArray(body))
    }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"$service $method $path -> ${resp.statusCode()}: ${resp.body().take(300)}")
    resp.body()
  }
}

/** S3 PutObject over the REST protocol — the reference's batch sink
  * transport (S3ObjectServiceImpl.kt:24-47): binary body, the metadata
  * sidecar fields as x-amz-meta-* user metadata, content-type
  * binary/octetstream. Path-style addressing (endpoint carries the
  * host), which is also what localstack/minio-style stubs accept. */
final class S3TransportClient(transport: AwsHttpTransport, bucket: String) {
  def putObject(key: String, body: Array[Byte],
      userMetadata: Map[String, String],
      contentType: String = "binary/octetstream"): Unit = {
    val headers = Map("content-type" -> contentType) ++
      userMetadata.map { case (k, v) =>
        (if (k.toLowerCase.startsWith("x-amz-meta-")) k.toLowerCase
         else s"x-amz-meta-${k.toLowerCase}") -> v
      }
    transport.request("PUT", s"/$bucket/$key", Nil, headers, body, "s3")
  }
}

/** DynamoDB UpdateItem over the x-amz-json-1.0 protocol — the status
  * store transport (DynamoDBExportStatusService.kt:30-136). The caller
  * provides the rendered request JSON (the repo's Completion/Control
  * layers own the byte-exact payload shapes). */
final class DynamoDbTransportClient(transport: AwsHttpTransport) {
  def updateItem(requestJson: String): String = call("UpdateItem", requestJson)
  def getItem(requestJson: String): String = call("GetItem", requestJson)
  private def call(op: String, json: String): String =
    transport.request("POST", "/", Nil,
      Map("content-type" -> "application/x-amz-json-1.0",
        "x-amz-target" -> s"DynamoDB_20120810.$op"),
      json.getBytes(StandardCharsets.UTF_8), "dynamodb")
}

/** SQS SendMessage / SNS Publish over the query protocol (the SDK v1
  * wire shape the reference links): form-encoded Action params POSTed
  * to the queue/topic endpoint. */
final class SqsTransportClient(transport: AwsHttpTransport) {
  def sendMessage(queuePath: String, messageBody: String,
      groupId: Option[String] = None,
      dedupId: Option[String] = None): Unit = {
    val params = Seq("Action" -> "SendMessage", "Version" -> "2012-11-05",
      "MessageBody" -> messageBody) ++
      groupId.map("MessageGroupId" -> _) ++
      dedupId.map("MessageDeduplicationId" -> _)
    transport.request("POST", queuePath, Nil,
      Map("content-type" -> "application/x-www-form-urlencoded"),
      formEncode(params), "sqs")
  }
  private def formEncode(params: Seq[(String, String)]): Array[Byte] =
    params.map { case (k, v) =>
      s"${AwsSigV4.uriEncode(k, keepSlash = false)}=${AwsSigV4.uriEncode(v, keepSlash = false)}"
    }.mkString("&").getBytes(StandardCharsets.UTF_8)
}

final class SnsTransportClient(transport: AwsHttpTransport) {
  def publish(topicArn: String, message: String): Unit = {
    val params = Seq("Action" -> "Publish", "Version" -> "2010-03-31",
      "TopicArn" -> topicArn, "Message" -> message)
    val body = params.map { case (k, v) =>
      s"${AwsSigV4.uriEncode(k, keepSlash = false)}=${AwsSigV4.uriEncode(v, keepSlash = false)}"
    }.mkString("&").getBytes(StandardCharsets.UTF_8)
    transport.request("POST", "/", Nil,
      Map("content-type" -> "application/x-www-form-urlencoded"),
      body, "sns")
  }
}
