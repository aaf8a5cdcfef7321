package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Structural anti-staleness check: README's query-range line must be
  * DERIVED from the actual `SparkEntry.queries` surface, so adding a
  * query without touching the README fails `sbt test` instead of
  * waiting for a reviewer to notice (the drift recurred two rounds
  * running before this spec existed). */
class ReadmeSyncSpec extends AnyFunSuite {

  test("README's query range matches SparkEntry.queries") {
    val names = graft.SparkEntry.queries.keys.toSeq
    val nums = names.map(_.drop(1).takeWhile(_.isDigit).toInt)
    val expected = f"q01..q${nums.max}%d"
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Path.of("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    assert(readme.contains(expected),
      s"README.md must mention the current query range '$expected' — " +
        "update the query-surface line")
    // and the range is contiguous with no duplicate numbers, so the
    // README claim "q01..qMAX" actually means every number exists
    assert(nums.sorted === (1 to nums.max).toSeq,
      "query numbering must stay contiguous and duplicate-free")
  }
}
