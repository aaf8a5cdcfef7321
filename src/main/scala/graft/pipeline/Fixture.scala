package graft.pipeline

import java.security.MessageDigest
import java.util.Base64
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic envelope fixture mirroring the reference's HBase test
  * corpus (images/hbase/hbase_data.py:40-104): n records with ids
  * `00000..`, even ids carrying an object payload `_id`
  * (`{"record_id": …}`) and odd ids a scalar payload `_id` (so exactly
  * 50% take the `$oid` path — asserted by the reference integration
  * test, src/integration/kotlin/UberTestSpec.kt:171-177); single cell
  * timestamp 1000; row key = 4-byte little-endian CRC32 of the JSON
  * message `_id` followed by its UTF-8 bytes (hbase_data.py:51-53).
  *
  * Divergence from the reference generator (deliberate, for
  * reproducibility): the per-record AES-CTR IV is derived from the
  * record index (md5) instead of drawn from a CSPRNG — ciphertexts are
  * stable across runs, so pipeline outputs are oracle-checkable
  * constants.
  *
  * Generation is distributed (`spark.range(n).mapPartitions`): at a
  * 100 TB-shaped scale the corpus builds in parallel with no driver
  * materialization.
  */
object Fixture {

  val Topic = "db.database.collection"
  val Db = "database"
  val Collection = "collection"
  val CellTimestamp = 1000L

  val MasterKeyId = "local-master-key-id"
  val MasterKeyB64: String = Base64.getEncoder.encodeToString(
    MessageDigest.getInstance("MD5").digest("local-master-key".getBytes("UTF-8")))

  def keyService: LocalKeyService = new LocalKeyService(MasterKeyB64, MasterKeyId)

  /** Record classes for the corrupted variant: index-mod-100 slots for
    * each typed skip path (missing mandatory field / undecryptable
    * ciphertext / unparseable decrypted payload). */
  val MissingFieldSlot = 13
  val BadCiphertextSlot = 37
  val BadJsonSlot = 59

  final case class RawCell(hbase_id: Array[Byte], ts: Long, value: String)

  /** First (signed) byte of record i's row key — the CRC32 low byte —
    * computable without building or encrypting the cell; lets a
    * key-range scan skip out-of-slice rows cheaply. */
  def keyPrefixByte(i: Long): Byte = {
    val idBytes = s"""{"record_id":"${f"$i%05d"}"}""".getBytes("UTF-8")
    val crc = new CRC32()
    crc.update(idBytes)
    (crc.getValue & 0xff).toByte
  }

  private def ivFor(i: Long, version: Int): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(
      (if (version == 0) s"iv:$i" else s"iv:$i:$version").getBytes("UTF-8"))

  private def jsonEscapeless(s: String): String = s // fixture strings need no escaping

  /** Shared envelope assembly: wraps `payload` for record i in the
    * encrypted envelope for (db, collection); `corrupt` enables the
    * ciphertext/dbObject skip slots common to every corpus. */
  private def buildCell(i: Long, db: String, collection: String,
      payload: String, dekPlainB64: String, encKeyB64: String,
      corrupt: Boolean, version: Int): RawCell = {
    val id5 = f"$i%05d"
    val messageIdJson = s"""{"record_id":"$id5"}"""
    val iv = ivFor(i, version)
    val ivB64 = Base64.getEncoder.encodeToString(iv)
    val ciphertext =
      if (corrupt && i % 100 == BadCiphertextSlot) "%%%not-base64%%%"
      else Crypto.encrypt(dekPlainB64, iv, payload.getBytes("UTF-8"))
    val dbObject =
      if (corrupt && i % 100 == MissingFieldSlot) "" else ciphertext
    val value =
      s"""{"traceId":"$id5","unitOfWorkId":"$id5","@type":"OUTER_TYPE","message":{"db":"$db","collection":"$collection","_id":$messageIdJson,"_timeBasedHash":"hash","@type":"INNER_TYPE","_lastModifiedDateTime":"2018-12-14T15:01:02.000+0000","encryption":{"encryptionKeyId":"","encryptedEncryptionKey":"${jsonEscapeless(encKeyB64)}","initialisationVector":"$ivB64","keyEncryptionKeyId":"$MasterKeyId"},"dbObject":"${jsonEscapeless(dbObject)}"},"version":"core-4.master.9790","timestamp":"2019-07-04T07:27:35.104+0000"}"""

    val idBytes = messageIdJson.getBytes("UTF-8")
    val crc = new CRC32()
    crc.update(idBytes)
    val c = crc.getValue
    // little-endian 4 bytes, matching python to_bytes(4, sys.byteorder)
    // on x86 (hbase_data.py:52)
    val prefix = Array[Byte](
      (c & 0xff).toByte, ((c >> 8) & 0xff).toByte,
      ((c >> 16) & 0xff).toByte, ((c >> 24) & 0xff).toByte)
    RawCell(prefix ++ idBytes, CellTimestamp + version, value)
  }

  /** One envelope cell; `corrupt` enables the typed-skip slots.
    *
    * `version` models HBase multi-version cells (the reference's tables
    * are created with `max_versions=1000000`, images/hbase/hbase_data
    * .py:32): version v of key i is stamped ts = [[CellTimestamp]] + v,
    * and for v > 0 the decrypted payload carries a `"v":v` marker so a
    * downstream reader can prove WHICH version was exported. Version 0
    * is bit-identical to the single-version cell, keeping every
    * existing golden frozen. */
  private[graft] def cell(i: Long, dekPlainB64: String, encKeyB64: String,
      corrupt: Boolean, version: Int = 0): RawCell = {
    val id5 = f"$i%05d"
    val payloadId =
      if (i % 2 == 0) s"""{"record_id":"$id5"}""" else s""""$id5""""
    val versionField = if (version == 0) "" else s""","v":$version"""
    val payload =
      if (corrupt && i % 100 == BadJsonSlot) "{{{"
      else
        s"""{"_id":$payloadId,"createdDateTime":"2015-03-20T12:23:25.183Z","_lastModifiedDateTime":"2018-12-14T15:01:02.000+0000"$versionField}"""
    buildCell(i, Db, Collection, payload, dekPlainB64, encKeyB64, corrupt, version)
  }

  /** businessAudit corpus slot: every 100th record omits `auditType`,
    * exercising the audit-transform failure path
    * (DecryptionProcessor.kt:64-66 throws → record skipped). */
  val MissingAuditSlot = 41

  /** One `data:businessAudit` envelope cell: the decrypted payload is
    * an audit event `{"context": {...}, "auditType": ...}` whose
    * context the pipeline must lift (DecryptionProcessor.kt:59-73). */
  private[graft] def auditCell(i: Long, dekPlainB64: String,
      encKeyB64: String, corrupt: Boolean): RawCell = {
    val id5 = f"$i%05d"
    val payload =
      if (corrupt && i % 100 == BadJsonSlot) "{{{"
      else if (corrupt && i % 100 == MissingAuditSlot)
        s"""{"context":{"AUDIT_ID":"$id5"}}"""
      else
        s"""{"context":{"AUDIT_ID":"$id5","USER":"user-$id5"},"auditType":"exampleAuditType"}"""
    buildCell(i, Transforms.BusinessAuditDb, Transforms.BusinessAuditCollection,
      payload, dekPlainB64, encKeyB64, corrupt, 0)
  }

  /** One `data.equality` envelope cell: standard payload under the
    * equality topic's (db, collection) — the pipeline must re-wrap the
    * sanitised document as `{"message": {...}}`
    * (TransformationProcessor.kt:21-46; UberTestSpec.kt:249-260). */
  private[graft] def equalityCell(i: Long, dekPlainB64: String,
      encKeyB64: String): RawCell = {
    val id5 = f"$i%05d"
    val payloadId =
      if (i % 2 == 0) s"""{"record_id":"$id5"}""" else s""""$id5""""
    val payload =
      s"""{"_id":$payloadId,"createdDateTime":"2015-03-20T12:23:25.183Z","_lastModifiedDateTime":"2018-12-14T15:01:02.000+0000"}"""
    buildCell(i, "data", "equality", payload, dekPlainB64, encKeyB64,
      corrupt = false, version = 0)
  }

  /** The raw scan DataFrame (hbase_id binary, ts long, value string). */
  def generate(spark: SparkSession, n: Long, corrupt: Boolean = false): DataFrame = {
    import spark.implicits._
    val ks = keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(MasterKeyId, dek)
    spark.range(n).mapPartitions { it =>
      it.map(i => cell(i, dek, encKey, corrupt))
    }.toDF()
  }

  /** The `data:businessAudit` corpus (audit-event payloads). */
  def generateBusinessAudit(spark: SparkSession, n: Long,
      corrupt: Boolean = false): DataFrame = {
    import spark.implicits._
    val ks = keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(MasterKeyId, dek)
    spark.range(n).mapPartitions { it =>
      it.map(i => auditCell(i, dek, encKey, corrupt))
    }.toDF()
  }

  /** The `data.equality` corpus (standard payloads, equality topic). */
  def generateEquality(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val ks = keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(MasterKeyId, dek)
    spark.range(n).mapPartitions { it =>
      it.map(i => equalityCell(i, dek, encKey))
    }.toDF()
  }
}
