package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Reconciliation pins for q185: each gate of the composed
  * release-candidate funnel, applied to the previous stage's
  * survivors, must reproduce exactly what the standalone query says
  * it should — the composition adds chaining, never new semantics. */
class ReleaseFunnelSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("q185 gates reconcile with their standalone queries") {
    val st = Curation.q185StagesOf(spark, dir)
    val near = ids(st.near)

    // repetition stage = near survivors that q59 (standalone) keeps
    val repKeep = TextAnalysis.qRepetition(spark, dir)
      .filter(col("keep")).select("doc_id")
    assert(ids(st.rep) == (near intersect ids(repKeep)))

    // quality stage = rep survivors with q26's standalone score >= 0.8
    val qualOk = TextAnalysis.qTextQuality(spark, dir)
      .filter(col("score") >= Curation.FunnelQualityFloor).select("doc_id")
    assert(ids(st.qual) == (ids(st.rep) intersect ids(qualOk)))

    // PII counts = qual survivors q58 (standalone) would redact
    val piiDocs = TextAnalysis.qPiiRedact(spark, dir)
      .filter(col("n_email") + col("n_phone") + col("n_ip") > 0)
      .select("doc_id")
    val nPii = st.withPii.agg(sum(col("pii_hit"))).head().getLong(0)
    assert(nPii == (ids(st.qual) intersect ids(piiDocs)).size.toLong)

    // decontamination = qual survivors minus q60's flagged docs
    val contaminated = Dedup.qDecontam(spark, dir).select("doc_id")
    assert(ids(st.decon) == (ids(st.qual) -- ids(contaminated)))

    // domain cap = q176's rank rule over the decon survivors
    val capWant = st.decon.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Double]("score")))
      .groupBy(_._2).values.flatMap(_.toSeq
        .sortBy(t => (-t._3, t._1)).take(Curation.DomainCap)).map(_._1).toSet
    assert(ids(st.cap) == capWant)

    // budget = q137's rule (40% of surviving token mass, quality order)
    // recomputed as the plain global prefix sum the oracle states
    val capRows = st.cap.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens").toLong,
        r.getAs[Double]("score")))
      .sortBy(t => (-t._3, t._1))
    val totalTok = capRows.map(_._2).sum
    var csum = 0L
    val selWant = capRows.takeWhile { t =>
      csum += t._2; csum <= (totalTok * 2) / 5 }.map(_._1).toSet
    assert(ids(st.selected) == selWant)
    val tokWant = capRows.filter(t => selWant(t._1)).map(_._2).sum
    val tokGot = st.selected.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(tokGot == tokWant)
  }

  test("q185 attrition is monotone and the report reconciles with stages") {
    val rep = Curation.q185ReleaseFunnel(spark, dir).collect()
    assert(rep.nonEmpty)
    for (r <- rep) {
      val seq = Seq("n_in", "n_exact", "n_near", "n_rep", "n_quality",
        "n_decontam", "n_cap", "n_budget").map(r.getAs[Long](_))
      assert(seq == seq.sorted.reverse,
        s"per-source attrition must be monotone: ${r.getAs[String]("source")} $seq")
      assert(r.getAs[Long]("n_pii_redacted") <= r.getAs[Long]("n_quality"))
    }
  }
}
