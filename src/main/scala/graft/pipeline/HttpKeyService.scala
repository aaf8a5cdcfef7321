package graft.pipeline

import java.io.FileInputStream
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.KeyStore
import java.time.Duration
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

import com.fasterxml.jackson.databind.ObjectMapper

/** Typed DKS failures (app/exceptions): 400 from the decrypt endpoint
  * is a permanent decryption failure and must NOT retry; every other
  * error is service unavailability and retries with backoff. */
final class DataKeyDecryptionException(message: String)
  extends RuntimeException(message)
final class DataKeyServiceUnavailableException(message: String)
  extends RuntimeException(message)

/** Mutual-TLS client configuration — the reference DKS speaks mTLS
  * (configuration/SecureHttpClientProvider.kt: identity keystore +
  * key password, truststore, timeouts). The CONFIG is what ships to
  * executors (paths + passwords serialize; an SSLContext does not) and
  * each JVM materialises its own context lazily. */
final case class TlsConfig(
    identityStore: String,
    identityStorePassword: String,
    identityKeyPassword: String,
    trustStore: String,
    trustStorePassword: String,
    storeType: String = "PKCS12",
    connectTimeoutMs: Long = 300000L) extends Serializable {

  /** SSLContext from the two stores (SecureHttpClientProvider.kt:40-48:
    * loadKeyMaterial + loadTrustMaterial over TLSv1.2). */
  def sslContext(): SSLContext = {
    def load(path: String, password: String): KeyStore = {
      val ks = KeyStore.getInstance(storeType)
      val in = new FileInputStream(path)
      try ks.load(in, password.toCharArray) finally in.close()
      ks
    }
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(load(identityStore, identityStorePassword),
      identityKeyPassword.toCharArray)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(load(trustStore, trustStorePassword))
    val ctx = SSLContext.getInstance("TLSv1.2")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  /** JDK HttpClient carrying this TLS identity. */
  def client(): HttpClient = HttpClient.newBuilder()
    .sslContext(sslContext())
    .connectTimeout(Duration.ofMillis(connectTimeoutMs))
    .build()
}

/** HTTP [[KeyService]] against a data-key-service endpoint — the
  * reference's HttpKeyService.kt re-expressed on the JDK HttpClient
  * (no extra deps):
  *
  *  - `batchDataKey`: GET `/datakey?correlationId=<uuid>`, expects 201,
  *    memoised per instance (HttpKeyService.kt:44-49 `@Synchronized`
  *    null-check memo);
  *  - `decryptKey`: POST the wrapped key to
  *    `/datakey/actions/decrypt?keyId=<id>&correlationId=<uuid>`,
  *    expects 200; 400 → [[DataKeyDecryptionException]] (permanent, no
  *    retry), anything else → [[DataKeyServiceUnavailableException]]
  *    (HttpKeyService.kt:96-161);
  *  - unwraps memoise in `decryptedKeyCache` keyed
  *    `"$encryptedKey/$keyEncryptionKeyId"` — the cache is consulted
  *    BEFORE any network call and survives retries
  *    (HttpKeyService.kt:103-110);
  *  - both calls retry ONLY on unavailability: 5 attempts, 1 s initial
  *    delay, ×2 backoff (HttpKeyService.kt:37-40,90-93 `@Retryable`).
  *
  * Scale: the service is Serializable (client + caches are transient,
  * rebuilt per executor), so one executor makes at most one unwrap
  * call per distinct wrapped key — the reference's per-JVM cache
  * contract, multiplied across the cluster.
  *
  * `runId` scopes the batch-key memo: the reference memoises per
  * Spring singleton = one application run, so a second export in the
  * same JVM must mint a FRESH data key, not reuse the previous run's
  * (the memo key is (endpoint, runId)). `tls` is the production mTLS
  * seam; None keeps the plain client for stub-server tests.
  */
final class HttpKeyService(baseUrl: String,
    policy: Retry.Policy = Retry.Policy(),
    sleeper: Long => Unit = Thread.sleep,
    runId: String = "local",
    tls: Option[TlsConfig] = None) extends KeyService {

  @transient private lazy val client =
    tls.fold(HttpClient.newHttpClient())(_.client())
  @transient private lazy val mapper = new ObjectMapper()
  // JVM-LEVEL caches keyed by endpoint (HttpKeyService.jvmCaches):
  // instance fields would be per-deserialized-TASK copy in Spark — a
  // 1000-task stage would then make up to 1000 unwrap calls per
  // distinct key instead of one per executor JVM, breaking the
  // reference's per-JVM cache contract (HttpKeyService.kt:103-110).
  private def cache: ConcurrentHashMap[String, String] =
    HttpKeyService.unwrapCacheFor(baseUrl)

  private def retryUnavailable[A](op: => A): A =
    Retry.withRetry(policy, sleeper,
      retryOn = _.isInstanceOf[DataKeyServiceUnavailableException])(op)

  private def parseDataKey(json: String): DataKeyResult = {
    val node = mapper.readTree(json)
    DataKeyResult(
      node.get("dataKeyEncryptionKeyId").asText(),
      node.get("plaintextDataKey").asText(),
      node.get("ciphertextDataKey").asText())
  }

  override def batchDataKey(): DataKeyResult =
    HttpKeyService.batchKeys.computeIfAbsent(s"$baseUrl#$runId", _ =>
      retryUnavailable {
        val correlationId = UUID.randomUUID().toString
        val response =
          try client.send(
            HttpRequest.newBuilder(
              URI.create(s"$baseUrl/datakey?correlationId=$correlationId")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          catch {
            case e: Exception => throw new DataKeyServiceUnavailableException(
              s"Error contacting data key service: '$e' for dks_correlation_id: '$correlationId'")
          }
        if (response.statusCode() == 201) parseDataKey(response.body())
        else throw new DataKeyServiceUnavailableException(
          s"Getting batch data key - data key service returned bad status code " +
            s"'${response.statusCode()}' for dks_correlation_id: '$correlationId'")
      })

  override def decryptKey(keyEncryptionKeyId: String, encryptedKey: String): String = {
    val cacheKey = s"$encryptedKey/$keyEncryptionKeyId"
    val cached = cache.get(cacheKey)
    if (cached != null) cached
    else retryUnavailable {
      val correlationId = UUID.randomUUID().toString
      val url = s"$baseUrl/datakey/actions/decrypt?keyId=" +
        s"${URLEncoder.encode(keyEncryptionKeyId, "US-ASCII")}&correlationId=$correlationId"
      val response =
        try client.send(
          HttpRequest.newBuilder(URI.create(url))
            .header("Content-Type", "text/plain")
            .POST(HttpRequest.BodyPublishers.ofString(encryptedKey)).build(),
          HttpResponse.BodyHandlers.ofString())
        catch {
          case e: Exception => throw new DataKeyServiceUnavailableException(
            s"Error contacting data key service: '$e' for dks_correlation_id: '$correlationId'")
        }
      response.statusCode() match {
        case 200 =>
          val plain = mapper.readTree(response.body()).get("plaintextDataKey").asText()
          cache.put(cacheKey, plain)
          plain
        case 400 => throw new DataKeyDecryptionException(
          s"Decrypting encryptedKey: '$encryptedKey' with keyEncryptionKeyId: " +
            s"'$keyEncryptionKeyId' data key service returned status code '400' " +
            s"for dks_correlation_id: '$correlationId'")
        case other => throw new DataKeyServiceUnavailableException(
          s"Decrypting encryptedKey: '$encryptedKey' with keyEncryptionKeyId: " +
            s"'$keyEncryptionKeyId' data key service returned status code '$other' " +
            s"for dks_correlation_id: '$correlationId'")
      }
    }
  }

  /** Cache size, exposed for tests of the memo contract. */
  def cachedKeyCount: Int = cache.size()
}

/** JVM-wide cache store: the unwrap memo is keyed per DKS endpoint
  * (unwraps are content-addressed — the same wrapped key decrypts
  * identically across runs), while batch keys are keyed
  * (endpoint, runId) so every export run mints a fresh DEK exactly
  * like the reference's one-Spring-singleton-per-application-run memo.
  * Test endpoints are port-unique, so suites stay isolated. */
object HttpKeyService {
  private val unwrapCaches =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
  private[pipeline] val batchKeys =
    new ConcurrentHashMap[String, DataKeyResult]()
  private[pipeline] def unwrapCacheFor(baseUrl: String): ConcurrentHashMap[String, String] =
    unwrapCaches.computeIfAbsent(baseUrl, _ => new ConcurrentHashMap[String, String]())
}
