package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Standing guard for the DuckDB wide-decimal literal hazard
  * (documented at `Relational.DLIT`): a bare decimal literal like
  * `0.9477977920742495` parses as DECIMAL(17,16), and DuckDB's
  * wide-decimal→double conversion double-rounds, landing one ulp off
  * the JVM double the Spark side carries — the q197/q65/q66/q195/q232
  * residue class closed in round 16. That closure was an ad-hoc sweep;
  * the hazard REGENERATES (the PQ centroid literals are data-derived,
  * so a regenerated fixture re-rolls them, and any new interpolated
  * Double can reintroduce the parse), so this spec renders every
  * `SparkEntry.oracleSql` statement and asserts zero bare decimal
  * literals with ≥ 15 significant digits. DLIT-rendered e-notation
  * (`…e0`) is exempt by construction — the exponent suffix forces
  * DuckDB's correctly-rounded strtod DOUBLE path. */
class OracleLiteralHygieneSpec extends AnyFunSuite {

  /** Bare decimal literals (digits.digits) not part of an e-notation
    * mantissa, an identifier, or a qualified name. The trailing
    * lookahead rejects `[\w.]`, so `1.234e5` / `1.234E5` never match
    * (the `e`/`E` is a word char). */
  private val BareDecimal = raw"(?<![\w.])\d+\.\d+(?![\w.])".r

  /** Single-quoted SQL string contents are NOT bare literals — the
    * parser never DECIMAL-types them, and `CAST('0.30102…' AS DOUBLE)`
    * (the q241 Benford constants) is the correctly-rounded strtod
    * path, same as DLIT's e-notation. Blank them out (preserving
    * offsets) before scanning. */
  private def blankQuoted(sql: String): String =
    raw"'[^']*'".r.replaceAllIn(sql, m => "'" + " " * (m.matched.length - 2) + "'")

  private def significantDigits(lit: String): Int =
    lit.filter(_.isDigit).dropWhile(_ == '0').length

  test("no rendered oracle statement carries a bare >=15-digit decimal literal") {
    val offenders = for {
      (name, sql) <- graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      m <- BareDecimal.findAllIn(blankQuoted(sql))
      if significantDigits(m) >= 15
    } yield s"$name: $m"
    assert(offenders.isEmpty,
      "bare decimal literals with >=15 significant digits parse as wide " +
        "DECIMAL in DuckDB and double-round the ->DOUBLE cast; route the " +
        "interpolation through Relational.DLIT (e-notation) instead:\n  " +
        offenders.mkString("\n  "))
  }

  test("the detector itself flags the q197-class literal") {
    // self-test: a regenerated fixture that re-rolls a 16-digit
    // centroid must be caught, so pin the matcher on the exact shape
    // that slipped through before round 16
    val hit = BareDecimal.findAllIn(
      "SELECT 0.9477977920742495 AS c").toSeq
    assert(hit === Seq("0.9477977920742495"))
    assert(significantDigits(hit.head) === 16)
    // and the DLIT-rendered form is exempt
    assert(BareDecimal.findAllIn(
      "SELECT 0.9477977920742495e0 AS c").isEmpty)
    // leading zeros do not count toward significance (0.0032135 = 5)
    assert(significantDigits("0.0032135") === 5)
    // quoted string contents are exempt (strtod path, not DECIMAL)
    assert(BareDecimal.findAllIn(blankQuoted(
      "CAST('0.3010299956639812' AS DOUBLE)")).isEmpty)
  }
}
