package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Topic-transform golden spec (reference: DecryptionProcessorTest.kt
  * businessAudit cases, TransformationProcessorTest.kt equality wrap). */
class TransformsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("businessAudit lifts context + stamps audit fields (DecryptionProcessor.kt:59-73)") {
    val decrypted =
      """{"auditType": "SOME_EVENT",
        | "context": {"userId": "u1", "detail": {"k": "v"}}}""".stripMargin
    val out = Transforms.businessAudit(decrypted, "2018-12-14T15:01:02.000+0000")
      .toOption.get
    val node = mapper.readTree(out)
    assert(node.get("userId").asText() == "u1")
    assert(node.get("AUDIT_EVENT").asText() == "SOME_EVENT")
    assert(node.get("TIME_STAMP").asText() == "2018-12-14T15:01:02.000+0000")
    assert(node.get("TIME_STAMP_ORIG").asText() == "2018-12-14T15:01:02.000+0000")
    assert(node.get("detail").get("k").asText() == "v")
    assert(!node.has("auditType")) // the lifted context replaces the doc
  }

  test("businessAudit missing auditType or context fails the record") {
    assert(Transforms.businessAudit("""{"context": {"a": 1}}""", "t").isLeft)
    assert(Transforms.businessAudit("""{"auditType": "E"}""", "t").isLeft)
    assert(Transforms.businessAudit("""{"auditType": null, "context": {}}""", "t").isLeft)
    assert(Transforms.businessAudit("not json", "t").isLeft)
  }

  test("equality wrap: {message: {...doc, @type: inner}} (TransformationProcessor.kt:37-44)") {
    val out = Transforms.equalityWrap("""{"a": 1, "b": null}""", "INNER_TYPE")
    val node = mapper.readTree(out)
    assert(node.size() == 1 && node.has("message"))
    assert(node.get("message").get("a").asInt() == 1)
    assert(node.get("message").get("b").isNull)
    assert(node.get("message").get("@type").asText() == "INNER_TYPE")
  }
}
