package graft.pipeline

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.ObjectMapper

/** Typed DKS failures (app/exceptions): 400 from the decrypt endpoint
  * is a permanent decryption failure and must NOT retry; every other
  * error is service unavailability and retries with backoff. */
final class DataKeyDecryptionException(message: String)
  extends RuntimeException(message)
final class DataKeyServiceUnavailableException(message: String)
  extends RuntimeException(message)

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
  */
final class HttpKeyService(baseUrl: String,
    policy: Retry.Policy = Retry.Policy(),
    sleeper: Long => Unit = Thread.sleep) extends KeyService {

  @transient private lazy val client = HttpClient.newHttpClient()
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
    HttpKeyService.batchKeys.computeIfAbsent(baseUrl, _ =>
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

/** JVM-wide cache store, one entry per DKS endpoint: every task on an
  * executor shares the unwrap memo and the per-run batch key exactly
  * like the reference's singleton Spring service. Test endpoints are
  * port-unique, so suites stay isolated. */
object HttpKeyService {
  private val unwrapCaches =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
  private[pipeline] val batchKeys =
    new ConcurrentHashMap[String, DataKeyResult]()
  private[pipeline] def unwrapCacheFor(baseUrl: String): ConcurrentHashMap[String, String] =
    unwrapCaches.computeIfAbsent(baseUrl, _ => new ConcurrentHashMap[String, String]())
}
