package graft.queries

import java.nio.file.Files

import graft.SparkSuite

/** Pin for the exact-0.7 dup-2gram boundary semantics (round-19
  * ADVICE): the q59/q185 repetition gates were rewritten from the
  * double form `1.0 - d/t <= 0.3` to the cross-multiplied integer form
  * `10*d >= 7*t` IN LOCKSTEP with the DuckDB oracle — deliberately
  * flipping rows whose dup-2gram fraction is EXACTLY 0.7-distinct
  * (i.e. dup fraction exactly 0.3) from dropped to kept, because the
  * double form's rounding (1.0 - 14.0/20.0 = 0.30000000000000004 >
  * 0.3) dropped what the rational predicate keeps. The sf fixtures
  * happened to be boundary-free, so nothing VALUE-pinned the flip;
  * this spec constructs the boundary row synthetically so the
  * lockstep — not the fixture accident — is what future rounds rely
  * on. If either engine's gate drifts back to the double form (or the
  * two dialects diverge), this fails before any fixture ever grows a
  * boundary row.
  */
class RepGateBoundarySpec extends SparkSuite {

  /** 21 tokens whose 20 bigrams have EXACTLY 14 distinct values:
    * dup_2gram_frac = 1 - 14/20 = 0.3 exactly as a rational, and
    * 0.30000000000000004 as the evaluated double. Two x-y-x-y-x-y
    * blocks each contribute 5 bigram occurrences over 2 distinct
    * values; max word frequency is 3/21 ≈ 0.143 ≤ the 0.15 top-word
    * gate, so ONLY the dup-2gram conjunct is at stake. */
  private val boundaryToks =
    "a b a b a b c d c d c d e f g h i j k l m".split(" ").toSeq
  /** Same shape one block deeper: 20 bigrams, 11 distinct →
    * 10·11 < 7·20, dropped by the dup-2gram conjunct alone (max word
    * frequency still 3/21). Disjoint vocabulary from the boundary doc
    * so the funnel's near-dedup stage cannot pair them. */
  private val droppedToks =
    "n o n o n o p q p q p q r s r s r s t u v".split(" ").toSeq

  private def bigrams(toks: Seq[String]): Seq[String] =
    toks.sliding(2).map(_.mkString(" ")).toSeq

  test("synthetic construction is the exact boundary") {
    assert(boundaryToks.size == 21)
    assert(bigrams(boundaryToks).size == 20)
    assert(bigrams(boundaryToks).distinct.size == 14) // 14/20 = 0.7 exactly
    assert(boundaryToks.groupBy(identity).values.map(_.size).max == 3)
    // the double the engine would compare against 0.3 is strictly above
    // it — the boundary-ness this spec exists to pin
    assert(1.0 - 14.0 / 20.0 > 0.3)
    assert(droppedToks.size == 21)
    assert(bigrams(droppedToks).size == 20)
    assert(bigrams(droppedToks).distinct.size == 11) // 10*11 < 7*20
    assert(droppedToks.groupBy(identity).values.map(_.size).max == 3)
  }

  private lazy val fixtureDir: String = {
    val tmp = Files.createTempDirectory("graft-repgate-").toString
    val rows = Seq(
      (100L, boundaryToks.mkString(" "), "en", "web"),
      (101L, droppedToks.mkString(" "), "en", "web"),
      // a clearly-kept doc (25 distinct tokens, zero duplicate bigrams)
      (102L, (1 to 25).map(i => s"w$i").mkString(" "), "en", "web"))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("long"))
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q59 keeps the exact-0.7 boundary row (integer gate, not double)") {
    val out = TextAnalysis.qRepetition(spark, fixtureDir)
      .select("doc_id", "dup_2gram_frac", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val (boundaryFrac, boundaryKeep) = out(100L)
    // the REPORTED fraction is the double — strictly above 0.3, i.e.
    // the old double-form gate would have dropped this row
    assert(boundaryFrac > 0.3, s"not a boundary row: $boundaryFrac")
    assert(boundaryKeep, "exact-0.7 boundary row must be KEPT (10d >= 7t)")
    assert(!out(101L)._2, "11/20-distinct row must be dropped")
    assert(out(102L)._2, "all-distinct row must be kept")
  }

  test("q185's rep stage agrees with q59 on the boundary row") {
    val rep = Curation.q185StagesOf(spark, fixtureDir).rep
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rep.contains(100L),
      "funnel rep stage dropped the exact-0.7 boundary row q59 keeps")
    assert(!rep.contains(101L))
    assert(rep.contains(102L))
  }

  test("both oracle dialects carry the same integer predicate") {
    // the lockstep's other half: the DuckDB SQL must gate on the SAME
    // cross-multiplied integers, or the driver compare would diverge
    // the day a fixture grows a boundary row
    assert(TextAnalysis.qRepetitionSql
      .contains("10 * n_distinct_grams >= 7 * n_grams"))
    assert(Curation.q185Sql
      .contains("10 * n_distinct_grams >= 7 * (n_tokens - 1)"))
  }
}
