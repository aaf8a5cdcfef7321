package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Golden behavioral spec mirroring the reference's ValidatorTest.kt
  * (925 lines): id canonicalization incl. key sorting (:38-56), scalar
  * id → `$oid` (:58-76), bad-JSON rejection (:100-118), archived-drop
  * (:125-169), the `_lastModifiedDateTime` fallback chain (:171-398),
  * `$date`-aware element fetch (:400-450), absent-id reverse
  * engineering (:452-477). */
class ValidatorSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def tree(s: String) = mapper.readTree(s)

  private val fullDoc =
    """{"_id": {"someId":"RANDOM_GUID","declarationId":1234}, "type": "addressDeclaration",
      | "addressLine2": null, "postcode": "SM5 2LE",
      | "createdDateTime": {"$date": "2015-03-20T12:23:25.183Z", "_archivedDateTime": "should be replaced by _removedDateTime"},
      | "_version": 2, "_archived": "should be replaced by _removed",
      | "_lastModifiedDateTime": "2019-07-04T07:27:35.104+0000"}""".stripMargin

  private def validateDefault(doc: String) =
    Validator.validate(doc, """{"record_id":"00001"}""", 1000L,
      "db", "collection", "OUTER_TYPE", "INNER_TYPE")

  test("valid json with object _id: manifest ids are key-sorted (ValidatorTest.kt:38-56)") {
    val v = validateDefault(fullDoc).toOption.get
    val idSorted = """{"declarationId":1234,"someId":"RANDOM_GUID"}"""
    assert(v.manifest == Validator.Manifest(idSorted, 1000L, "db", "collection",
      "EXPORT", "OUTER_TYPE", "INNER_TYPE", idSorted))
  }

  test("scalar _id becomes {$oid} (ValidatorTest.kt:58-76)") {
    val doc = fullDoc.replace("""{"someId":"RANDOM_GUID","declarationId":1234}""",
      "\"JSON_PRIMITIVE_STRING\"")
    val v = validateDefault(doc).toOption.get
    assert(v.manifest.id == """{"$oid":"JSON_PRIMITIVE_STRING"}""")
    assert(v.manifest.originalId == "JSON_PRIMITIVE_STRING")
    assert(tree(v.doc).get("_id").get("$oid").asText() == "JSON_PRIMITIVE_STRING")
  }

  test("invalid json rejected (ValidatorTest.kt:100-118)") {
    assert(validateDefault("""{"testOne":"test1", "testTwo":2""").isLeft)
    assert(validateDefault("hello").isLeft)
  }

  test("_archivedDateTime dropped only when _removedDateTime present (ValidatorTest.kt:125-169)") {
    val both =
      """{"_id": {"id": "12345"},
        | "_archivedDateTime": "2021-10-10T03:35:51.145+0000",
        | "_removedDateTime": "2021-10-12T10:06:01.280+0000",
        | "_lastModifiedDateTime": "2021-10-02T14:02:16.653+0000"}""".stripMargin
    val v1 = validateDefault(both).toOption.get
    assert(tree(v1.doc).has("_removedDateTime") && !tree(v1.doc).has("_archivedDateTime"))

    val onlyArchived =
      """{"_id": {"id": "12345"},
        | "_archivedDateTime": "2021-10-10T03:35:51.145+0000",
        | "_lastModifiedDateTime": "2021-10-02T14:02:16.653+0000"}""".stripMargin
    val v2 = validateDefault(onlyArchived).toOption.get
    assert(tree(v2.doc).has("_archivedDateTime") && !tree(v2.doc).has("_removedDateTime"))
  }

  // ---------------------------------------------------- fallback chain

  private def lastModified(json: String): String =
    Validator.retrieveLastModifiedDateTime(
      tree(json).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])

  private val d1 = "2019-12-14T15:01:02.000+0000"
  private val d2 = "2018-12-14T15:01:02.000+0000"

  test("fallback chain: string _lastModifiedDateTime wins (ValidatorTest.kt:171-198)") {
    assert(lastModified(s"""{"_lastModifiedDateTime": "$d1", "createdDateTime": "$d2"}""") == d1)
    assert(lastModified(s"""{"_lastModifiedDateTime": {"$$date": "$d1"}, "createdDateTime": {"$$date": "$d2"}}""") == d1)
  }

  test("fallback chain: _removedDateTime next (ValidatorTest.kt:200-280)") {
    assert(lastModified(s"""{"_removedDateTime": "$d1"}""") == d1)
    assert(lastModified(s"""{"_lastModifiedDateTime": "", "_removedDateTime": "$d1"}""") == d1)
    assert(lastModified(s"""{"_lastModifiedDateTime": null, "_removedDateTime": "$d1"}""") == d1)
    assert(lastModified(s"""{"_removedDateTime": "$d1", "createdDateTime": "$d2"}""") == d1)
    assert(lastModified(s"""{"_removedDateTime": {"$$date": "$d1"}, "createdDateTime": {"$$date": "$d2"}}""") == d1)
  }

  test("fallback chain: createdDateTime next (ValidatorTest.kt:282-345)") {
    assert(lastModified(s"""{"createdDateTime": "$d1"}""") == d1)
    assert(lastModified(s"""{"_lastModifiedDateTime": {"date": "$d1"}, "createdDateTime": {"$$date": "$d2"}}""") == d2)
    assert(lastModified(s"""{"_lastModifiedDateTime": "", "createdDateTime": {"$$date": "$d1"}}""") == d1)
    assert(lastModified(s"""{"_lastModifiedDateTime": null, "createdDateTime": "$d1"}""") == d1)
  }

  test("fallback chain: epoch default (ValidatorTest.kt:347-398)") {
    val epoch = "1980-01-01T00:00:00.000Z"
    assert(lastModified("""{"a": 1}""") == epoch)
    assert(lastModified(s"""{"_lastModifiedDateTime": {"date": "$d1"}, "createdDateTime": {"date": "$d2"}}""") == epoch)
    assert(lastModified("""{"_lastModifiedDateTime": "", "createdDateTime": ""}""") == epoch)
    assert(lastModified("""{"_lastModifiedDateTime": null, "createdDateTime": null}""") == epoch)
  }

  test("$date-aware element fetch (ValidatorTest.kt:400-450)") {
    def fetch(json: String) = Validator.retrieveDateTimeElement("el",
      tree(json).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode])
    assert(fetch("""{"el": "A Date"}""") == "A Date")
    assert(fetch("""{"el": {"$date": "A Date"}}""") == "A Date")
    assert(fetch("""{"el": {"date": "x"}}""") == "")
    assert(fetch("""{"el": null}""") == "")
  }

  test("absent _id reverse-engineered from row key (ValidatorTest.kt toleratesAbsenceOfId)") {
    val doc =
      """{"_id1":{"test_key_a":"test_value_a","test_key_b":"test_value_b"},
        | "_lastModifiedDateTime": "2018-12-14T15:01:02.000+0000"}""".stripMargin
    val v = Validator.validate(doc, """{ "id": "12345" }""", 1000L,
      "db", "collection", "OUTER_TYPE", "INNER_TYPE").toOption.get
    assert(v.manifest.id == """{"$oid":"12345"}""")
    assert(v.manifest.originalId == "12345")
    assert(tree(v.doc).get("_lastModifiedDateTime").get("$date").asText()
      == "2018-12-14T15:01:02.000Z")
  }

  test("non-scalar row key id reverse-engineers to sorted json (IdUtility.kt:13-16)") {
    val (orig, altered) = Validator.reverseEngineerId("""{"b":"2","a":"1"}""")
    assert(orig == """{"a":"1","b":"2"}""" && altered == orig)
  }

  test("sortJsonByKey sorts top-level keys only (JsonUtils.kt:7-14)") {
    assert(Validator.sortJsonByKey("""{"b":{"z":1,"a":2},"a":3}""")
      == """{"a":3,"b":{"z":1,"a":2}}""")
  }

  test("dual-format parse + outgoing reformat (Validator.kt:153-170)") {
    assert(Validator.formatToOutgoing("2019-07-04T07:27:35.104+0000")
      == "2019-07-04T07:27:35.104Z")
    assert(Validator.formatToOutgoing("2019-07-04T07:27:35.104Z")
      == "2019-07-04T07:27:35.104Z")
    assert(Validator.formatToOutgoing("2001-12-01T15:01:02.000+0100")
      == "2001-12-01T14:01:02.000Z")
    intercept[java.text.ParseException](Validator.formatToOutgoing("A Date"))
  }

  test("manifest timestamp preference flips with snapshot type (Validator.kt:172-193)") {
    val created = "2015-03-20T12:23:25.183Z"
    val modified = "2018-12-14T15:01:02.000+0000"
    val createdMs = Validator.parseValidDateTime(created).getTime
    val modifiedMs = Validator.parseValidDateTime(modified).getTime
    assert(Validator.timestampAsLong(created, modified, "full") == createdMs)
    assert(Validator.timestampAsLong(created, modified, "incremental") == modifiedMs)
    assert(Validator.timestampAsLong("garbage", modified, "full") == modifiedMs)
  }

  test("validate stamps the manifest ts per record by snapshot type") {
    val modifiedMs = Validator.parseValidDateTime(
      "2019-07-04T07:27:35.104+0000").getTime
    // full: the cell timestamp, exactly the reference's ManifestRecord
    val full = validateDefault(fullDoc).toOption.get
    assert(full.manifest.timestamp == 1000L)
    // incremental: the record's own _lastModifiedDateTime
    val incr = Validator.validate(fullDoc, """{"record_id":"00001"}""", 1000L,
      "db", "collection", "OUTER_TYPE", "INNER_TYPE", "incremental").toOption.get
    assert(incr.manifest.timestamp == modifiedMs)
    // incremental with absent _lastModifiedDateTime: createdDateTime
    // fallback — here nested under $date, fetched date-aware (a
    // present-but-garbage value would skip the whole record in
    // wrapDates, reference-faithfully, before the manifest is built)
    val noLm = fullDoc.replace(
      """"_lastModifiedDateTime": "2019-07-04T07:27:35.104+0000"""",
      """"unrelated": 0""")
    val createdMs = Validator.parseValidDateTime("2015-03-20T12:23:25.183Z").getTime
    val fb = Validator.validate(noLm, """{"record_id":"00001"}""", 1000L,
      "db", "collection", "OUTER_TYPE", "INNER_TYPE", "incremental").toOption.get
    assert(fb.manifest.timestamp == createdMs)
    // both document fields unusable: the cell timestamp backstop
    val neither = """{"_id": "X", "a": 1}"""
    val bs = Validator.validate(neither, """{"record_id":"00001"}""", 1000L,
      "db", "collection", "OUTER_TYPE", "INNER_TYPE", "incremental").toOption.get
    assert(bs.manifest.timestamp == 1000L)
  }
}
