package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Scalacheck properties for the canonicalization + rewrite semantics
  * (SURVEY §5: "scalacheck property tests for canonical-JSON and
  * date-wrapping idempotence" — §7.4 risk 6 is exactly these edge
  * cases drifting golden hashes). */
class JsonPropsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // JSON value generator: scalars, nested objects, arrays (bounded)
  private val keyGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
  private def valueGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      5 -> scalarGen,
      2 -> Gen.mapOf(Gen.zip(keyGen, valueGen(depth - 1))).map(_.take(4)),
      1 -> Gen.listOf(valueGen(depth - 1)).map(_.take(4)))
  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)), Gen.choose(-1000000, 1000000),
    Gen.choose(-1e6, 1e6), Gen.oneOf(true, false), Gen.const(null),
    Gen.const("2018-12-14T15:01:02.000+0000")) // date-shaped strings too
  private val objGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(keyGen, valueGen(2))).map(_.take(6))

  private def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => mapper.writeValueAsString(s)
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      .map { case (k, x) => mapper.writeValueAsString(k) + ":" + toJson(x) }
      .mkString("{", ",", "}")
    case l: List[_] => l.map(toJson).mkString("[", ",", "]")
    case other => other.toString
  }

  test("canonical json is idempotent") {
    check(Prop.forAll(objGen) { m =>
      val once = Validator.sortJsonByKey(toJson(m))
      Validator.sortJsonByKey(once) == once
    })
  }

  test("canonical json is invariant to top-level key order") {
    check(Prop.forAll(objGen) { m =>
      val forward = toJson(m)
      val reversed = m.toSeq.reverse
        .map { case (k, x) => mapper.writeValueAsString(k) + ":" + toJson(x) }
        .mkString("{", ",", "}")
      Validator.sortJsonByKey(forward) == Validator.sortJsonByKey(reversed)
    })
  }

  test("canonical json preserves the value set (parse round-trip)") {
    check(Prop.forAll(objGen) { m =>
      val json = toJson(m)
      mapper.readTree(Validator.sortJsonByKey(json)) == mapper.readTree(json)
    })
  }

  test("date wrapping is idempotent on object fields") {
    // arrays excluded AT EVERY DEPTH: the reference re-wraps array-held
    // $date objects (pinned in DateWrapperSpec) — idempotence holds for
    // object fields only
    def stripArrays(v: Any): Any = v match {
      case l: List[_] => "was-array"
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].view.mapValues(stripArrays).toMap
      case other => other
    }
    check(Prop.forAll(objGen) { m0 =>
      val m = stripArrays(m0).asInstanceOf[Map[String, Any]]
      val node = mapper.readTree(toJson(m))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      Validator.wrapDatesInTree(node, includeLastModified = false)
      val once = node.deepCopy()
      Validator.wrapDatesInTree(node, includeLastModified = false)
      node == once
    })
  }

  test("sanitise is idempotent") {
    check(Prop.forAll(objGen, Gen.oneOf(Sanitise.SpecificCollections.toSeq)) {
      case (m, (db, coll)) =>
        val once = Sanitise.sanitise(toJson(m), db, coll)
        Sanitise.sanitise(once, db, coll) == once
    })
  }
}
