package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins for q184 span-dedup APPLY: exactness of the excision on
  * constructed overlapping spans, and reconciliation of the cleaned
  * token mass with q177's audit accounting at sf0.001. */
class SpanDedupApplySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q184 excises the union of overlapping kill-span occurrences once") {
    import spark.implicits._
    // "a b c d e" and "b c d e f" are both 5-token spans shared by 3
    // docs (support >= BoilerplateMinSupport = 3); in doc 1 they
    // OVERLAP, covering positions 0..5 as a union (6 tokens, not 10)
    val boiler = "a b c d e f"
    val docsDf = Seq(
      (1L, "web", s"$boiler x y z"),
      (2L, "web", s"u $boiler v"),
      (3L, "web", s"w $boiler"),
      (4L, "web", "p q r"), // short doc, below span width: untouched
      (5L, "web", "g h i j k l m n")) // no kill span: untouched
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.spanDedupApply(docsDf).collect()
      .map(r => r.getLong(0) -> r).toMap

    // doc 1: tokens 0..5 covered -> cleaned = "x y z"
    assert(out(1L).getAs[Long]("covered") == 6)
    assert(out(1L).getAs[Long]("n_clean") == 3)
    assert(out(1L).getAs[String]("clean_sig") == md5hex("x y z"))
    // doc 2: boilerplate at offset 1 -> cleaned = "u v"
    assert(out(2L).getAs[Long]("covered") == 6)
    assert(out(2L).getAs[String]("clean_sig") == md5hex("u v"))
    // doc 3: boilerplate is the tail -> cleaned = "w"
    assert(out(3L).getAs[String]("clean_sig") == md5hex("w"))
    // untouched docs keep their full text, covered = 0
    assert(out(4L).getAs[Long]("covered") == 0)
    assert(out(4L).getAs[String]("clean_sig") == md5hex("p q r"))
    assert(out(5L).getAs[Long]("covered") == 0)
    assert(out(5L).getAs[String]("clean_sig") == md5hex("g h i j k l m n"))
    // conservation on every row: n_clean = n_tokens - covered
    assert(out.values.forall(r =>
      r.getAs[Long]("n_clean") ==
        r.getAs[Long]("n_tokens") - r.getAs[Long]("covered")))
  }

  test("q184 cleaned token mass reconciles with q177's audit per source") {
    val applied = TextAnalysis.qSpanDedupApply(spark, dir)
      .groupBy("source")
      .agg(sum(col("n_tokens")).as("n_tokens"),
        sum(col("covered")).as("covered_tokens"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val audit = TextAnalysis.qSpanDedupAudit(spark, dir)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("covered_tokens"))).toMap
    assert(applied == audit,
      s"apply accounting must equal the q177 audit: $applied vs $audit")
  }
}
