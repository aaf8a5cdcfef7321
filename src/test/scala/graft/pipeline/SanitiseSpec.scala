package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Golden behavioral spec mirroring the reference's
  * SanitisationProcessorTest.kt (148 lines): the universal `$`→`d_` /
  * ` ` / `_archived*` chain, the gated escaped-newline removal for
  * the three specific collections, and the multi-escape lookbehind. */
class SanitiseSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def ser(json: String): String =
    mapper.writeValueAsString(mapper.readTree(json))

  test("removes $, \\u0000 escape, renames _archived* (SanitisationProcessorTest.kt:19-28)") {
    // the NUL char serializes as the six-char \u0000 escape, which the
    // chain then deletes
    val node = mapper.createObjectNode()
    node.put("fieldA", "a$\u0000")
    node.put("_archivedDateTime", "b")
    node.put("_archived", "c")
    val serialized = mapper.writeValueAsString(node)
    assert(serialized.contains("\\u0000")) // escaped on serialization
    val out = Sanitise.sanitise(serialized, "db", "collection")
    assert(out == """{"fieldA":"ad_","_removedDateTime":"b","_removed":"c"}""")
  }

  test("multi-escaped newlines survive the gated regex (SanitisationProcessorTest.kt:30-37)") {
    val data =
      """{"message":{"db":"penalties-and-deductions","collection":"sanction"},"data":{"carriage":"\\r","newline":"\\n","superEscaped":"\\\r\\\n"}}"""
    val out = Sanitise.sanitise(ser(data), "penalties-and-deductions", "sanction")
    assert(out == ser(data))
  }

  test("gated collections lose unescaped \\r \\n escapes (SanitisationProcessorTest.kt:39-56)") {
    val in = ser(
      """{"_id": {"declarationId": "47a4fad9\r"},
        | "type": "addressDeclaration\n",
        | "contractId": "aa16e682\r\n",
        | "createdDateTime": {"$date": "2015-03-20T12:23:25.183Z"}}""".stripMargin)
    val expected = ser(
      """{"_id": {"declarationId": "47a4fad9"},
        | "type": "addressDeclaration",
        | "contractId": "aa16e682",
        | "createdDateTime": {"d_date": "2015-03-20T12:23:25.183Z"}}""".stripMargin)
    for ((db, coll) <- Sanitise.SpecificCollections)
      assert(Sanitise.sanitise(in, db, coll) == expected)
  }

  test("other collections keep control-char escapes (SanitisationProcessorTest.kt:62-68)") {
    val in = ser("""{"a": "x\r", "b": "y\n"}""")
    val out = Sanitise.sanitise(in, "db", "collection")
    assert(out == in) // \r \n escapes survive; nothing else to rewrite
  }

  test("the [r|n] class also removes escaped pipes in gated collections (SanitisationProcessor.kt:14)") {
    // JSON can't naturally produce \| but the reference regex matches it;
    // exercised directly on the raw string form
    assert(Sanitise.sanitiseCollectionSpecific("""a\|b""",
      "core", "healthAndDisabilityDeclaration") == "ab")
    assert(Sanitise.sanitiseCollectionSpecific("""a\\|b""",
      "core", "healthAndDisabilityDeclaration") == """a\\|b""")
  }

  test("column form agrees with the scala form") {
    import org.apache.spark.sql.functions.col
    val spark = graft.core.Sessions.local("4", maxTaskFailures = 2)
    import spark.implicits._
    val rows = Seq(
      (ser("""{"a": "x$\r", "b_archived": "1"}"""), "penalties-and-deductions", "sanction"),
      (ser("""{"a": "x$\r", "b_archivedDateTime": "1"}"""), "db", "collection"),
      ("""a\|b$""", "core", "healthAndDisabilityDeclaration"))
    val df = rows.toDF("doc", "db", "coll")
    val got = df.select(Sanitise.sanitiseCol(col("doc"), col("db"), col("coll")))
      .as[String].collect()
    val want = rows.map { case (d, db, c) => Sanitise.sanitise(d, db, c) }
    assert(got.toSeq == want)
  }
}
