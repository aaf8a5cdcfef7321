package graft.pipeline

import java.security.Key
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** AES-CTR codec + data-key service, re-expressing the reference's
  * crypto surface (reference: app/services/impl/AESCipherService.kt:26-61,
  * app/services/impl/HttpKeyService.kt:44-49,96-161) on the stock JCE
  * provider (AES/CTR/NoPadding needs no BouncyCastle).
  *
  * CTR compatibility note: the JCE treats the 16-byte IV as the initial
  * 128-bit big-endian counter block — identical to the reference
  * fixture's PyCrypto `Counter.new(128, initial_value=iv_int)`
  * (reference: images/hbase/hbase_data.py:63-70), so ciphertext made by
  * either side round-trips through the other.
  */
object Crypto {

  private def keySpec(keyB64: String): Key =
    new SecretKeySpec(Base64.getDecoder.decode(keyB64), "AES")

  private def cipher(mode: Int, keyB64: String, iv: Array[Byte]): Cipher = {
    val c = Cipher.getInstance("AES/CTR/NoPadding")
    c.init(mode, keySpec(keyB64), new IvParameterSpec(iv))
    c
  }

  /** Decrypt a Base64 AES-CTR ciphertext with a Base64 key + IV,
    * returning UTF-8 plaintext (reference: AESCipherService.kt:38-44). */
  def decrypt(keyB64: String, ivB64: String, encryptedB64: String): String = {
    val c = cipher(Cipher.DECRYPT_MODE, keyB64, Base64.getDecoder.decode(ivB64))
    new String(c.doFinal(Base64.getDecoder.decode(encryptedB64)), "UTF-8")
  }

  /** Encrypt with a caller-supplied IV (deterministic fixtures need a
    * derived IV; production callers pass random bytes — reference:
    * AESCipherService.kt:26-36 draws from SecureRandom). Returns
    * Base64 ciphertext. */
  def encrypt(keyB64: String, iv: Array[Byte], plaintext: Array[Byte]): String = {
    val c = cipher(Cipher.ENCRYPT_MODE, keyB64, iv)
    Base64.getEncoder.encodeToString(c.doFinal(plaintext))
  }

  /** Streaming encrypting cipher for the snapshot writer
    * (reference: AESCipherService.kt:46-47 cipherOutputStream). */
  def encryptingCipher(keyB64: String, iv: Array[Byte]): Cipher =
    cipher(Cipher.ENCRYPT_MODE, keyB64, iv)

  def decryptingCipher(keyB64: String, iv: Array[Byte]): Cipher =
    cipher(Cipher.DECRYPT_MODE, keyB64, iv)
}

/** One batch data key per run + per-record key unwrap
  * (reference: app/services/KeyService.kt contract; HTTP impl
  * HttpKeyService.kt:44-49 `@Synchronized batchDataKey` memo,
  * :96-161 `decryptKey` with memo cache). */
trait KeyService extends Serializable {
  /** Unwrap (decrypt) a per-record data key. */
  def decryptKey(keyEncryptionKeyId: String, encryptedKey: String): String
  /** The single per-run batch data key (memoised). */
  def batchDataKey(): DataKeyResult
}

final case class DataKeyResult(
    dataKeyEncryptionKeyId: String,
    plaintextDataKey: String,
    ciphertextDataKey: String)

/** Local stand-in for the DKS: wraps/unwraps data keys with a static
  * master key using AES-CTR (IV derived from the key-encryption-key id,
  * so wrap/unwrap is deterministic and self-inverse). The memo cache
  * mirrors the reference's `decryptedKeyCache` semantics
  * (HttpKeyService.kt:96-110): one unwrap per distinct
  * (keyId, encryptedKey) per JVM — on a cluster, per executor.
  */
final class LocalKeyService(masterKeyB64: String, masterKeyId: String)
    extends KeyService {

  // Per-JVM (per-executor) memo; @transient so the driver's cache never
  // serializes into tasks, lazily rebuilt on each executor.
  @transient private lazy val cache = new ConcurrentHashMap[String, String]()

  private def ivFor(keyId: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(keyId.getBytes("UTF-8")) // 16 bytes

  /** Wrap a plaintext data key (fixture/test side). */
  def encryptKey(keyEncryptionKeyId: String, plaintextKeyB64: String): String =
    Crypto.encrypt(masterKeyB64, ivFor(keyEncryptionKeyId),
      plaintextKeyB64.getBytes("UTF-8"))

  override def decryptKey(keyEncryptionKeyId: String, encryptedKey: String): String =
    cache.computeIfAbsent(s"$encryptedKey/$keyEncryptionKeyId", _ =>
      Crypto.decrypt(masterKeyB64, Base64.getEncoder.encodeToString(
        ivFor(keyEncryptionKeyId)), encryptedKey))

  @transient private lazy val batchKey: DataKeyResult = {
    // Deterministic batch DEK for the local impl; the HTTP impl gets a
    // fresh key from the DKS once per run (HttpKeyService.kt:44-49).
    val plain = Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"batch-dek:$masterKeyId".getBytes("UTF-8")))
    DataKeyResult(masterKeyId, plain, encryptKey(masterKeyId, plain))
  }

  override def batchDataKey(): DataKeyResult = batchKey

  /** Cache size, exposed for tests of the memo contract. */
  def cachedKeyCount: Int = cache.size()
}
