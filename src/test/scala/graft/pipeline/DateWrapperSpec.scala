package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

/** Golden behavioral spec mirroring the reference's DateWrapperTest.kt
  * (206 lines): deep recursive wrapping incl. arrays and
  * arrays-of-arrays, top-level `_lastModifiedDateTime` exclusion,
  * non-UTC normalization, `$date`-object re-wrapping, `_id` subtree
  * wrapping. Trees compared structurally (like the reference's
  * JsonObject equality). */
class DateWrapperSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def wrapped(json: String): ObjectNode = {
    val node = mapper.readTree(json).asInstanceOf[ObjectNode]
    Validator.wrapDatesInTree(node, includeLastModified = false)
    node
  }
  private def expectTree(actual: ObjectNode, expected: String): Unit =
    assert(actual == mapper.readTree(expected),
      s"\nactual:   ${mapper.writeValueAsString(actual)}\nexpected: $expected")

  test("processes deep dates (DateWrapperTest.kt:11-92)") {
    val in =
      """{
        | "_lastModifiedDateTime": {"$date": "2001-12-14T15:01:02.000+0000"},
        | "notDate1": 123, "notDate2": "abc",
        | "parentDate": "2017-12-14T15:01:02.000+0000",
        | "childObjectWithDates": {
        |   "_lastModifiedDateTime": {"$date": "1980-12-14T15:01:02.000+0000"},
        |   "grandChildObjectWithDate": {
        |     "notDate1": 123, "notDate2": "abc",
        |     "grandChildDate1": "2019-12-14T15:01:02.000+0000"},
        |   "childDate": "2018-12-14T15:01:02.000+0000",
        |   "arrayWithDates": [
        |     789, "xyz",
        |     "2010-12-14T15:01:02.000+0000",
        |     ["2011-12-14T15:01:02.000+0000", "qwerty"],
        |     {"grandChildDate3": "2012-12-14T15:01:02.000+0000",
        |      "_lastModifiedDateTime": "1995-12-14T15:01:02.000+0000"}]}}""".stripMargin
    val out =
      """{
        | "_lastModifiedDateTime": {"$date": "2001-12-14T15:01:02.000+0000"},
        | "notDate1": 123, "notDate2": "abc",
        | "parentDate": {"$date": "2017-12-14T15:01:02.000Z"},
        | "childObjectWithDates": {
        |   "_lastModifiedDateTime": {"$date": "1980-12-14T15:01:02.000Z"},
        |   "grandChildObjectWithDate": {
        |     "notDate1": 123, "notDate2": "abc",
        |     "grandChildDate1": {"$date": "2019-12-14T15:01:02.000Z"}},
        |   "childDate": {"$date": "2018-12-14T15:01:02.000Z"},
        |   "arrayWithDates": [
        |     789, "xyz",
        |     {"$date": "2010-12-14T15:01:02.000Z"},
        |     [{"$date": "2011-12-14T15:01:02.000Z"}, "qwerty"],
        |     {"grandChildDate3": {"$date": "2012-12-14T15:01:02.000Z"},
        |      "_lastModifiedDateTime": {"$date": "1995-12-14T15:01:02.000Z"}}]}}""".stripMargin
    expectTree(wrapped(in), out)
  }

  test("ignores top-level _lastModifiedDateTime (DateWrapperTest.kt:95-106)") {
    val in = """{"_lastModifiedDateTime": "2001-12-14T15:01:02.000+0000"}"""
    expectTree(wrapped(in), in)
  }

  test("wraps common date fields (DateWrapperTest.kt:108-134)") {
    val in =
      """{"_lastModifiedDateTime": "2001-12-14T15:01:02.000+0000",
        | "createdDateTime": "2001-12-01T15:01:02.000+0000",
        | "_removedDateTime": "2001-12-02T15:01:02.000+0000",
        | "_archivedDateTime": "2001-12-03T15:01:02.000+0000"}""".stripMargin
    val out =
      """{"_lastModifiedDateTime": "2001-12-14T15:01:02.000+0000",
        | "createdDateTime": {"$date": "2001-12-01T15:01:02.000Z"},
        | "_removedDateTime": {"$date": "2001-12-02T15:01:02.000Z"},
        | "_archivedDateTime": {"$date": "2001-12-03T15:01:02.000Z"}}""".stripMargin
    expectTree(wrapped(in), out)
  }

  test("non-UTC offsets normalize to Z (DateWrapperTest.kt:137-155)") {
    expectTree(wrapped("""{"dateTime": "2001-12-01T15:01:02.000+0100"}"""),
      """{"dateTime": {"$date": "2001-12-01T14:01:02.000Z"}}""")
  }

  test("re-wraps mongo $date objects in place (DateWrapperTest.kt:157-175)") {
    expectTree(wrapped("""{"dateTime": {"$date": "2001-12-01T15:01:02.000+0000"}}"""),
      """{"dateTime": {"$date": "2001-12-01T15:01:02.000Z"}}""")
  }

  test("wraps dates inside _id (DateWrapperTest.kt:178-205)") {
    val in =
      """{"_id": {
        |  "_lastModifiedDateTime": "2001-12-14T15:01:02.000+0000",
        |  "createdDateTime": "2001-12-01T15:01:02.000+0000",
        |  "someOtherDate": "1990-12-02T15:01:02.000+0000"}}""".stripMargin
    val out =
      """{"_id": {
        |  "_lastModifiedDateTime": {"$date": "2001-12-14T15:01:02.000Z"},
        |  "createdDateTime": {"$date": "2001-12-01T15:01:02.000Z"},
        |  "someOtherDate": {"$date": "1990-12-02T15:01:02.000Z"}}}""".stripMargin
    expectTree(wrapped(in), out)
  }

  test("wrapping is idempotent for object fields") {
    val in = """{"d": "2017-12-14T15:01:02.000+0000", "o": {"inner": "2010-12-14T15:01:02.000+0000"}}"""
    val once = wrapped(in)
    val again = once.deepCopy()
    Validator.wrapDatesInTree(again, includeLastModified = false)
    assert(once == again)
  }

  test("array-element $date objects re-wrap (reference quirk, DateWrapper.kt:56-73)") {
    // processJsonArray recurses into object elements WITHOUT the
    // mongo-date check, so an array-held {"$date": s} gains a second
    // wrap on a second pass — the reference does the same; pinned here
    // so a "fix" would be flagged as a divergence.
    val once = wrapped("""{"arr": ["2010-12-14T15:01:02.000+0000"]}""")
    val again = once.deepCopy()
    Validator.wrapDatesInTree(again, includeLastModified = false)
    expectTree(again,
      """{"arr": [{"$date": {"$date": "2010-12-14T15:01:02.000Z"}}]}""")
  }

  test("non-date strings and malformed near-dates untouched") {
    val in = """{"a": "not a date", "b": "2017-12-14", "c": "2017-12-14T15:01:02Z",
      | "d": "2017-12-14T15:01:02.00+0000"}""".stripMargin
    expectTree(wrapped(in), in)
  }
}
