package graft.pipeline

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** HTTP key service against a local stub endpoint, mirroring the
  * reference's HttpKeyServiceTest.kt: retry-until-successful,
  * give-up-after-max-attempts, no-retry on 400, and the memo cache
  * holding across calls and retries. */
class HttpKeyServiceSpec extends AnyFunSuite {

  private val noSleep: Long => Unit = _ => ()

  private val keyJson =
    """{"dataKeyEncryptionKeyId":"kek-id","plaintextDataKey":"plain-key","ciphertextDataKey":"cipher-key"}"""

  /** Stub DKS: serves a scripted sequence of status codes (the last
    * repeats), counting requests per path prefix. */
  private def withServer(script: Int*)(test: (String, AtomicInteger) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val requests = new AtomicInteger
    server.createContext("/", (exchange: HttpExchange) => {
      val n = requests.incrementAndGet()
      val status = script(math.min(n - 1, script.length - 1))
      val body =
        if (status == 201 || status == 200) keyJson.getBytes("UTF-8")
        else "error".getBytes("UTF-8")
      exchange.sendResponseHeaders(status, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try test(s"http://localhost:${server.getAddress.getPort}", requests)
    finally server.stop(0)
  }

  test("batchDataKey parses the 201 response and memoises (one request for two calls)") {
    withServer(201) { (url, requests) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      val key = svc.batchDataKey()
      assert(key == DataKeyResult("kek-id", "plain-key", "cipher-key"))
      assert(svc.batchDataKey() == key)
      assert(requests.get() == 1)
    }
  }

  test("batchDataKey retries on bad status until successful (HttpKeyServiceTest.kt)") {
    withServer(503, 503, 201) { (url, requests) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      assert(svc.batchDataKey().plaintextDataKey == "plain-key")
      assert(requests.get() == 3)
    }
  }

  test("decryptKey unwraps on 200 and memoises across calls") {
    withServer(200) { (url, requests) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      assert(svc.decryptKey("kek-id", "wrapped") == "plain-key")
      assert(svc.decryptKey("kek-id", "wrapped") == "plain-key")
      assert(requests.get() == 1, "second call must hit the memo cache")
      assert(svc.cachedKeyCount == 1)
      // a different wrapped key is a distinct cache entry
      assert(svc.decryptKey("kek-id", "wrapped-2") == "plain-key")
      assert(requests.get() == 2)
      assert(svc.cachedKeyCount == 2)
    }
  }

  test("decryptKey retries on 5xx and the cache holds across the retries") {
    withServer(503, 503, 200) { (url, requests) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      assert(svc.decryptKey("kek-id", "wrapped") == "plain-key")
      assert(requests.get() == 3, "two failures then success")
      assert(svc.decryptKey("kek-id", "wrapped") == "plain-key")
      assert(requests.get() == 3, "post-retry call must be served from cache")
    }
  }

  test("decryptKey on 400 throws DataKeyDecryptionException WITHOUT retrying") {
    withServer(400) { (url, requests) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      intercept[DataKeyDecryptionException](svc.decryptKey("kek-id", "wrapped"))
      assert(requests.get() == 1, "permanent failure must not retry")
    }
  }

  test("decryptKey gives up after maxAttempts on persistent unavailability") {
    withServer(503) { (url, requests) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      intercept[DataKeyServiceUnavailableException](
        svc.decryptKey("kek-id", "wrapped"))
      assert(requests.get() == 5, "default policy is 5 attempts")
    }
  }

  test("connection errors surface as unavailability and retry") {
    // nothing listens on this port: connect fails, wrapped + retried
    val svc = new HttpKeyService("http://localhost:1",
      Retry.Policy(maxAttempts = 3), noSleep)
    intercept[DataKeyServiceUnavailableException](svc.batchDataKey())
  }

  test("decrypt round-trip against the stub: pipeline-grade key material flows") {
    withServer(200) { (url, _) =>
      val svc = new HttpKeyService(url, sleeper = noSleep)
      // the unwrapped key is whatever the DKS says — verify it lands
      // verbatim in the KeyService contract position
      assert(svc.decryptKey("other-kek", "abc") == "plain-key")
    }
  }

  test("batch key memo is scoped per run: a second run mints a fresh DEK") {
    withServer(201) { (url, requests) =>
      val run1 = new HttpKeyService(url, sleeper = noSleep, runId = "run-1")
      run1.batchDataKey(); run1.batchDataKey()
      assert(requests.get() == 1, "one run = one batch key request")
      // same endpoint, new run: the previous run's DEK must NOT be
      // reused (the reference memoises per application run)
      val run2 = new HttpKeyService(url, sleeper = noSleep, runId = "run-2")
      run2.batchDataKey()
      assert(requests.get() == 2, "a new run must fetch its own key")
      // while two service instances OF THE SAME run share the memo
      // (the per-executor contract)
      val run2b = new HttpKeyService(url, sleeper = noSleep, runId = "run-2")
      run2b.batchDataKey()
      assert(requests.get() == 2)
    }
  }

  test("mTLS seam: batchDataKey over HTTPS with keystore/truststore config") {
    import scala.sys.process._
    val dir = java.nio.file.Files.createTempDirectory("graft-tls").toFile
    val ks = new java.io.File(dir, "identity.p12").getAbsolutePath
    // self-signed keypair via the JDK's own keytool — serves as the
    // server identity AND (self-signed) the client's trust anchor
    val gen = Seq("keytool", "-genkeypair", "-alias", "dks", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", "changeit", "-keypass", "changeit",
      "-dname", "CN=localhost", "-validity", "1",
      "-ext", "san=dns:localhost,ip:127.0.0.1")
    assert(gen.! == 0, "keytool must generate the test keystore")

    val tls = TlsConfig(
      identityStore = ks, identityStorePassword = "changeit",
      identityKeyPassword = "changeit",
      trustStore = ks, trustStorePassword = "changeit")

    val server = com.sun.net.httpserver.HttpsServer.create(
      new InetSocketAddress("localhost", 0), 0)
    server.setHttpsConfigurator(
      new com.sun.net.httpserver.HttpsConfigurator(tls.sslContext()))
    server.createContext("/", (exchange: HttpExchange) => {
      val body = keyJson.getBytes("UTF-8")
      exchange.sendResponseHeaders(201, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.start()
    try {
      val url = s"https://localhost:${server.getAddress.getPort}"
      val svc = new HttpKeyService(url, Retry.Policy(maxAttempts = 2),
        noSleep, runId = "tls-run", tls = Some(tls))
      assert(svc.batchDataKey() ==
        DataKeyResult("kek-id", "plain-key", "cipher-key"))
      // without the TLS config the self-signed server is untrusted:
      // the default client must fail as unavailability, not succeed
      val plain = new HttpKeyService(url, Retry.Policy(maxAttempts = 2),
        noSleep, runId = "tls-run-plain")
      intercept[DataKeyServiceUnavailableException](plain.batchDataKey())
    } finally server.stop(0)
  }
}
