package graft.pipeline

import java.security.MessageDigest
import java.util.Base64

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** AES-CTR codec + key-service contract (reference:
  * AESCipherServiceTest.kt, HttpKeyServiceTest.kt cache semantics). */
class CryptoSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val key = Base64.getEncoder.encodeToString(
    MessageDigest.getInstance("MD5").digest("unit-test-key".getBytes))
  private val iv = MessageDigest.getInstance("MD5").digest("unit-test-iv".getBytes)
  private val ivB64 = Base64.getEncoder.encodeToString(iv)

  test("encrypt/decrypt round trip") {
    val plain = """{"_id": {"record_id": "00042"}, "x": 1}"""
    val ct = Crypto.encrypt(key, iv, plain.getBytes("UTF-8"))
    assert(ct != plain)
    assert(Crypto.decrypt(key, ivB64, ct) == plain)
  }

  test("round trip holds for arbitrary strings (property)") {
    checkProp(Prop.forAll(Gen.asciiStr, Gen.listOf(Gen.choose(32, 0x10ffff))) {
      (ascii, codepoints) =>
        val s = ascii + new String(codepoints.filterNot(cp =>
          cp >= 0xd800 && cp <= 0xdfff).flatMap(Character.toChars(_)).toArray)
        val ct = Crypto.encrypt(key, iv, s.getBytes("UTF-8"))
        Crypto.decrypt(key, ivB64, ct) == s
    })
  }

  test("wrong key fails to recover plaintext") {
    val other = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("MD5").digest("other".getBytes))
    val ct = Crypto.encrypt(key, iv, "payload".getBytes("UTF-8"))
    assert(Crypto.decrypt(other, ivB64, ct) != "payload")
  }

  test("CTR counter semantics: long plaintext (multi-block) round-trips") {
    val plain = "x" * 10000
    val ct = Crypto.encrypt(key, iv, plain.getBytes("UTF-8"))
    assert(Crypto.decrypt(key, ivB64, ct) == plain)
  }

  test("LocalKeyService wrap/unwrap + memo cache (HttpKeyService.kt:96-110)") {
    val ks = Fixture.keyService
    val dek = ks.batchDataKey()
    assert(dek.dataKeyEncryptionKeyId == Fixture.MasterKeyId)
    val unwrapped = ks.decryptKey(Fixture.MasterKeyId, dek.ciphertextDataKey)
    assert(unwrapped == dek.plaintextDataKey)
    assert(ks.cachedKeyCount == 1)
    ks.decryptKey(Fixture.MasterKeyId, dek.ciphertextDataKey)
    assert(ks.cachedKeyCount == 1) // memoised, not re-unwrapped
    assert(ks.batchDataKey() eq dek) // one batch DEK per run (:44-49)
  }

  test("fixture cells decrypt back to their payload") {
    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    for (i <- Seq(0L, 1L, 42L, 9999L)) {
      val cell = Fixture.cell(i, dek, encKey, corrupt = false)
      val value = new ObjectMapperHolder().m.readTree(cell.value)
      val msg = value.get("message")
      val plain = Crypto.decrypt(
        ks.decryptKey(
          msg.get("encryption").get("keyEncryptionKeyId").asText(),
          msg.get("encryption").get("encryptedEncryptionKey").asText()),
        msg.get("encryption").get("initialisationVector").asText(),
        msg.get("dbObject").asText())
      assert(plain.contains(f"$i%05d"))
      assert(plain.startsWith("""{"_id":"""))
    }
  }

  private class ObjectMapperHolder {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
  }
}
