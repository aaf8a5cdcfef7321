package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** SigV4 signer + transport spec: the signer against AWS's published
  * SigV4 example request (the public test vector from the "Signature
  * Version 4 signing process" documentation), and the transport
  * against a local endpoint that INDEPENDENTLY recomputes the
  * signature from the request as received on the wire — which is
  * exactly what AWS does, and what catches a wire path that diverges
  * from the signed canonical path (object keys with spaces, '%', '#',
  * '?'). */
class AwsTransportSpec extends AnyFunSuite {

  private val noSleep: Long => Unit = _ => ()

  test("signer reproduces AWS's published SigV4 example signature (GET iam ListUsers)") {
    // the documented example: GET https://iam.amazonaws.com/
    //   ?Action=ListUsers&Version=2010-05-08 at 20150830T123600Z with
    // credentials AKIDEXAMPLE / wJalrXUtnFEMI...EXAMPLEKEY
    val creds = AwsSigV4.Credentials("AKIDEXAMPLE",
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
    val signed = AwsSigV4.sign(
      method = "GET",
      path = "/",
      query = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08"),
      headers = Map(
        "host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      payloadSha256 = AwsSigV4.EmptyPayloadHash,
      region = "us-east-1", service = "iam", creds = creds,
      now = Instant.parse("2015-08-30T12:36:00Z"))
    assert(signed("Authorization") ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("uriEncode: unreserved set kept, everything else percent-encoded, slash optional") {
    assert(AwsSigV4.uriEncode("AZaz09-._~", keepSlash = false) === "AZaz09-._~")
    assert(AwsSigV4.uriEncode("a b", keepSlash = false) === "a%20b")
    assert(AwsSigV4.uriEncode("a/b", keepSlash = true) === "a/b")
    assert(AwsSigV4.uriEncode("a/b", keepSlash = false) === "a%2Fb")
    assert(AwsSigV4.uriEncode("100%", keepSlash = false) === "100%25")
    assert(AwsSigV4.uriEncode("#?&=", keepSlash = false) === "%23%3F%26%3D")
    // UTF-8 multi-byte percent-encodes per byte
    assert(AwsSigV4.uriEncode("é", keepSlash = false) === "%C3%A9")
  }

  private val creds = AwsSigV4.Credentials("AKIDSPEC", "secret-spec-key")
  private val region = "eu-west-2"

  /** Local endpoint that plays AWS: for each request it recomputes the
    * SigV4 signature FROM THE WIRE — the raw path and headers as
    * received — using the shared secret, and serves the scripted
    * status only if the signatures match (403 otherwise), recording
    * raw paths. */
  private def withVerifyingServer(script: Int*)(
      test: (AwsHttpTransport, AtomicInteger, () => Seq[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val requests = new AtomicInteger
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    server.createContext("/", (ex: HttpExchange) => {
      val n = requests.incrementAndGet()
      val body = ex.getRequestBody.readAllBytes()
      val rawPath = ex.getRequestURI.getRawPath
      paths.synchronized { paths += rawPath }
      val auth = ex.getRequestHeaders.getFirst("Authorization")
      // parse "AWS4-HMAC-SHA256 Credential=.../date/region/service/...,
      //        SignedHeaders=a;b;c, Signature=hex"
      val sigOk = try {
        val parts = auth.stripPrefix("AWS4-HMAC-SHA256 ").split(", ")
        val credParts = parts(0).stripPrefix("Credential=").split("/")
        val (shortDate, svc) = (credParts(1), credParts(3))
        val signedNames = parts(1).stripPrefix("SignedHeaders=").split(";")
        val sentSig = parts(2).stripPrefix("Signature=")
        val canonicalHeaders = signedNames
          .map(h => s"$h:${ex.getRequestHeaders.getFirst(h).trim}\n").mkString
        val canonicalRequest = Seq(ex.getRequestMethod, rawPath,
          Option(ex.getRequestURI.getRawQuery).getOrElse(""),
          canonicalHeaders, signedNames.mkString(";"),
          AwsSigV4.sha256Hex(body)).mkString("\n")
        val stringToSign = Seq("AWS4-HMAC-SHA256",
          ex.getRequestHeaders.getFirst("x-amz-date"),
          s"$shortDate/$region/$svc/aws4_request",
          AwsSigV4.sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8)))
          .mkString("\n")
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          AwsSigV4.signingKey(creds.secretAccessKey, shortDate, region, svc),
          "HmacSHA256"))
        val expect = mac.doFinal(stringToSign.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        expect == sentSig
      } catch { case _: Exception => false }
      val status = if (!sigOk) 403 else script(math.min(n - 1, script.length - 1))
      val resp = (if (sigOk) "ok" else "SignatureDoesNotMatch")
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    val endpoint = s"http://localhost:${server.getAddress.getPort}"
    val transport = new AwsHttpTransport(endpoint, region, creds,
      sleeper = noSleep)
    try test(transport, requests, () => paths.synchronized(paths.toSeq))
    finally server.stop(0)
  }

  test("wire path IS the signed canonical path for keys with space/%/#/? " +
      "(server-side signature recomputation passes)") {
    withVerifyingServer(200) { (transport, requests, paths) =>
      val s3 = new S3TransportClient(transport, "bkt")
      val key = "dir with space/100%/report#1?.txt"
      s3.putObject(key, "payload".getBytes(StandardCharsets.UTF_8),
        Map("title" -> "t"))
      assert(requests.get() === 1)
      // received exactly the canonical encoding the signature covers
      assert(paths() === Seq(
        "/bkt/dir%20with%20space/100%25/report%231%3F.txt"))
    }
  }

  test("transport retries transient failures, then succeeds (5x2 policy)") {
    withVerifyingServer(500, 503, 200) { (transport, requests, _) =>
      val s3 = new S3TransportClient(transport, "bkt")
      s3.putObject("plain.txt", "x".getBytes(StandardCharsets.UTF_8), Map.empty)
      assert(requests.get() === 3)
    }
  }

  test("transport raises after exhausting retries on persistent failure") {
    withVerifyingServer(500) { (transport, requests, _) =>
      val s3 = new S3TransportClient(transport, "bkt")
      intercept[java.io.IOException] {
        s3.putObject("plain.txt", "x".getBytes(StandardCharsets.UTF_8), Map.empty)
      }
      assert(requests.get() === 5) // Retry.Policy default attempts
    }
  }
}
