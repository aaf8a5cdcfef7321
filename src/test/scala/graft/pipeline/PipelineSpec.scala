package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end pipeline spec over the deterministic fixture — the
  * ScalaTest mirror of the reference's integration assertions
  * (UberTestSpec.kt:171-177 50% `$oid`, :416-423 d_oid readback,
  * HBaseResultProcessorTest.kt envelope extraction + mandatory-field
  * failures + db/collection fallback). Runs at n=1000 for speed; the
  * oracle-checked q40/q41 run the full 10k corpus. */
class PipelineSpec extends SparkSuite {

  private lazy val out = ExportPipeline.run(
    Fixture.generate(spark, 1000), Fixture.Topic, Fixture.keyService)
  private lazy val recs = ExportPipeline.records(out).cache()

  test("clean corpus: all records survive, no skips") {
    assert(out.count() == 1000)
    assert(recs.count() == 1000)
  }

  test("envelope fields extracted (HBaseResultProcessorTest.kt)") {
    val r = recs.filter(col("id_json") === """{"record_id":"00007"}""")
      .select("db", "collection", "outer_type", "inner_type", "last_modified", "ts")
      .collect()(0)
    assert(r.getString(0) == "database")
    assert(r.getString(1) == "collection")
    assert(r.getString(2) == "OUTER_TYPE")
    assert(r.getString(3) == "INNER_TYPE")
    assert(r.getString(4) == "2018-12-14T15:01:02.000+0000")
    assert(r.getLong(5) == 1000L)
  }

  test("50% of ids take the $oid -> d_oid path (UberTestSpec.kt:171-177)") {
    assert(recs.filter(col("doc").contains("d_oid")).count() == 500)
    assert(recs.filter(col("m_id").contains("$oid")).count() == 500)
  }

  test("every doc is date-wrapped and sanitised (UberTestSpec.kt:416-423)") {
    assert(recs.filter(col("doc").contains("d_date")).count() == 1000)
    assert(recs.filter(col("doc").contains("$date")).count() == 0)
    assert(recs.filter(col("doc").contains("$oid")).count() == 0)
  }

  test("manifest ids unique + canonical") {
    assert(recs.select("m_id").distinct().count() == 1000)
    assert(recs.filter(col("m_source") === "EXPORT").count() == 1000)
  }

  test("corrupted corpus: typed skip accounting (JobConfiguration.kt:57-61)") {
    val corrupted = ExportPipeline.run(
      Fixture.generate(spark, 1000, corrupt = true), Fixture.Topic,
      Fixture.keyService)
    val counts = ExportPipeline.skipSummary(corrupted).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "ok" -> 970L, "missing:dbObject" -> 10L,
      "decrypt_failed" -> 10L, "bad_decrypted" -> 10L))
  }

  test("db/collection fall back to the topic name (HBaseResultProcessor.kt:79-94)") {
    import spark.implicits._
    val raw = Seq((Array[Byte](0, 0, 0, 0) ++ """{"id":"1"}""".getBytes("UTF-8"),
      1000L,
      """{"message":{"_id":{"id":"1"},"encryption":{"keyEncryptionKeyId":"k","encryptedEncryptionKey":"e","initialisationVector":"i"},"dbObject":"x"}}"""))
      .toDF("hbase_id", "ts", "value")
    val parsed = Envelope.parse(raw, "db.fallbackdb.fallbackcoll")
    val r = parsed.select("db", "collection", "outer_type", "inner_type", "err").collect()(0)
    assert(r.getString(0) == "fallbackdb")
    assert(r.getString(1) == "fallbackcoll")
    assert(r.getString(2) == "TYPE_NOT_SET")
    assert(r.getString(3) == "TYPE_NOT_SET")
    assert(r.isNullAt(4))
  }

  test("mandatory-field misses are typed, in reference order (HBaseResultProcessor.kt:44-49)") {
    import spark.implicits._
    def cellJson(enc: String, dbObject: String) =
      s"""{"message":{"db":"d","collection":"c","encryption":$enc,"dbObject":$dbObject}}"""
    val full = """{"keyEncryptionKeyId":"k","encryptedEncryptionKey":"e","initialisationVector":"i"}"""
    val noIv = """{"keyEncryptionKeyId":"k","encryptedEncryptionKey":"e"}"""
    val noKek = """{"encryptedEncryptionKey":"e","initialisationVector":"i"}"""
    val rows = Seq(
      cellJson(full, "null"), // missing dbObject
      cellJson(noKek, "\"x\""), // missing keyEncryptionKeyId
      cellJson(noIv, "\"x\""), // missing initializationVector
      "not json at all", // bad envelope
      cellJson(full, "\"x\"")) // ok
      .map(v => (Array[Byte](0, 0, 0, 0, '{'.toByte, '}'.toByte), 1L, v))
    val parsed = Envelope.parse(rows.toDF("hbase_id", "ts", "value"), "db.d.c")
    val errs = parsed.select("err").collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(errs.toSeq == Seq("missing:dbObject", "missing:keyEncryptionKeyId",
      "missing:initializationVector", "bad_envelope", null))
  }

  test("businessAudit topic lifts context (DecryptionProcessor.kt:59-73)") {
    import spark.implicits._
    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val payload = """{"auditType": "EVT", "context": {"u": "1"}}"""
    val iv = java.security.MessageDigest.getInstance("MD5").digest("iv".getBytes)
    val ct = Crypto.encrypt(dek, iv, payload.getBytes("UTF-8"))
    val ivB64 = java.util.Base64.getEncoder.encodeToString(iv)
    val value =
      s"""{"@type":"O","message":{"db":"data","collection":"businessAudit","_id":{"id":"1"},"@type":"I","_lastModifiedDateTime":"2018-12-14T15:01:02.000+0000","encryption":{"keyEncryptionKeyId":"${Fixture.MasterKeyId}","encryptedEncryptionKey":"$encKey","initialisationVector":"$ivB64"},"dbObject":"$ct"}}"""
    val raw = Seq((Array[Byte](0, 0, 0, 0) ++ """{"id":"1"}""".getBytes, 1000L, value))
      .toDF("hbase_id", "ts", "value")
    val res = ExportPipeline.records(
      ExportPipeline.run(raw, "data.businessAudit", ks))
    val doc = res.select("doc").as[String].collect()(0)
    assert(doc.contains("\"AUDIT_EVENT\":\"EVT\""))
    // the lifted TIME_STAMP is itself date-shaped, so the downstream
    // validator wraps it and sanitise renames the key — exactly as the
    // reference pipeline order does (transform before validate)
    assert(doc.contains("\"TIME_STAMP\":{\"d_date\":\"2018-12-14T15:01:02.000Z\"}"))
    assert(!doc.contains("auditType"))
  }

  test("equality topic wraps output in {message} (TransformationProcessor.kt:21-46)") {
    import spark.implicits._
    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)
    val payload = """{"_id": "id1", "k": "v"}"""
    val iv = java.security.MessageDigest.getInstance("MD5").digest("iv2".getBytes)
    val ct = Crypto.encrypt(dek, iv, payload.getBytes("UTF-8"))
    val ivB64 = java.util.Base64.getEncoder.encodeToString(iv)
    val value =
      s"""{"@type":"O","message":{"db":"data","collection":"equality","_id":{"id":"1"},"@type":"I","encryption":{"keyEncryptionKeyId":"${Fixture.MasterKeyId}","encryptedEncryptionKey":"$encKey","initialisationVector":"$ivB64"},"dbObject":"$ct"}}"""
    val raw = Seq((Array[Byte](0, 0, 0, 0) ++ """{"id":"1"}""".getBytes, 1000L, value))
      .toDF("hbase_id", "ts", "value")
    val res = ExportPipeline.records(
      ExportPipeline.run(raw, "data.equality", ks))
    val doc = res.select("doc").as[String].collect()(0)
    assert(doc.startsWith("""{"message":{"""))
    assert(doc.contains("\"@type\":\"I\""))
    assert(doc.contains("d_oid")) // sanitise ran before the wrap
  }
}
