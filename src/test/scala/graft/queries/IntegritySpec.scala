package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Behavioral specs for the integrity battery (q114–q123): CDC merge
  * semantics, fuzzy-join exactness vs brute force, Spearman bounds,
  * triangle-census invariants, audit checklist shape, and the
  * array-battery conservation law. */
class IntegritySpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q115 merge: deletes drop, inserts land, latest update wins, untouched keys ride through") {
    val merged = Integrity.q115CdcMerge(spark, dir).cache()
    try {
      val base = graft.core.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("bp"),
          col("o_orderstatus").as("bs")).cache()
      // deletes: no %10==2 base key survives
      assert(merged.filter(col("o_orderkey") % 10 === 2 &&
        col("o_orderkey") < 100000000L).count() === 0)
      // inserts: every %10==7 base key reappears shifted with status N
      val n7 = base.filter(col("k") % 10 === 7).count()
      val ins = merged.filter(col("o_orderkey") >= 100000000L)
      assert(ins.count() === n7)
      assert(ins.filter(col("status") =!= "N").count() === 0)
      // latest-wins: %10==1 keys carry the seq-2 update (status Y,
      // price = base + 200.25 exactly)
      val u = merged.filter(col("o_orderkey") % 10 === 1)
        .join(base, merged("o_orderkey") === base("k"))
      assert(u.filter(col("status") =!= "Y").count() === 0)
      assert(u.filter(abs(col("price") - col("bp") - 200.25) > 1e-9).count() === 0)
      // untouched keys: identical price and status
      val un = merged.filter(
          (col("o_orderkey") % 10).isin(0, 4, 5, 6, 8, 9))
        .join(base, merged("o_orderkey") === base("k"))
      assert(un.filter(col("price") =!= col("bp") ||
        col("status") =!= col("bs")).count() === 0)
      base.unpersist()
    } finally merged.unpersist()
  }

  test("q120 deletion-neighborhood join equals the brute-force levenshtein join") {
    val fast = Integrity.q120FuzzyJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val vocab = graft.core.Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .union(graft.core.Tables.load(spark, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("w")))
      .filter(length(col("w"))
        .between(Integrity.FuzzyMinLen, Integrity.FuzzyMaxLen))
      .distinct()
    val brute = vocab.as("a").crossJoin(vocab.as("b"))
      .filter(col("a.w") < col("b.w") &&
        levenshtein(col("a.w"), col("b.w")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(fast === brute)
    assert(brute.nonEmpty, "fixture should yield at least one fuzzy pair")
  }

  test("q122 spearman: rho bounded, group sizes match, ranks conserve") {
    val rows = Integrity.q122Spearman(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12, s"rho out of range: $rho")
      assert(r.getAs[Long]("n") > 1)
    }
    val nFromData = graft.core.Tables.load(spark, dir, "events")
      .filter(col("value").isNotNull).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(r.getAs[Long]("n") === nFromData(r.getAs[String]("event_type")))
  }

  test("q114 triangle census: 3T <= W and closure in [0,1]") {
    val r = GraphOps.q114Triangles(spark, dir).head()
    val (t3, w) = (r.getAs[Long]("triangles"), r.getAs[Long]("wedges"))
    val closure = r.getAs[Double]("closure")
    assert(3 * t3 <= w, s"3T=$t3 > W=$w")
    assert(closure >= 0.0 && closure <= 1.0)
  }

  test("q116 audit: full checklist in order; fixture keys are clean") {
    val rows = Integrity.q116QualityAudit(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq(
      "documents_empty_text", "events_null_mandatory", "lineitem_fk_orders",
      "lineitem_qty_range", "orders_fk_customer", "orders_pk_dup"))
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("orders_pk_dup") === 0L)
    assert(byName("lineitem_fk_orders") === 0L)
    assert(byName("orders_fk_customer") === 0L)
    assert(rows.forall(_.getLong(1) >= 0L))
  }

  test("q124 variant extraction agrees with the string-path extraction (q73)") {
    val vrows = EventAnalytics.q124Variant(spark, dir)
      .select("event_type", "n", "sum_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val srows = EventAnalytics.q73JsonExtract(spark, dir)
      .select("event_type", "n", "sum_k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(vrows === srows)
    // missing paths are NULL for every row (tri-state semantics)
    val miss = EventAnalytics.q124Variant(spark, dir).collect()
    assert(miss.forall(r => r.getAs[Long]("n_missing") == r.getAs[Long]("n")))
  }

  test("q125 merged read surfaces NULL source exactly for the pre-evolution batch") {
    val out = Relational.q125SchemaEvolution(spark, dir).collect()
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val expected = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("with_src"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (r <- out) {
      val (n, withSrc) = expected(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("n_with_source") === withSrc)
    }
  }

  test("q129 diff classifies exactly the constructed change classes") {
    val diff = Integrity.q129TableDiff(spark, dir).cache()
    try {
      val keys = graft.core.Tables.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k")).cache()
      def nMod(m: Int) = keys.filter(col("k") % 7 === m).count()
      val byType = diff.groupBy("change_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType.getOrElse("removed", 0L) === nMod(1))
      assert(byType.getOrElse("added", 0L) === nMod(2))
      assert(byType.getOrElse("changed", 0L) === nMod(0))
      // every changed row moved by exactly +50.25
      assert(diff.filter(col("change_type") === "changed" &&
        abs(col("new_price") - col("old_price") - 50.25) > 1e-9).count() === 0)
      keys.unpersist()
    } finally diff.unpersist()
  }

  test("q126 stream-static join equals the all-batch join in-engine") {
    val streamed = StreamingQueries.q126StreamStaticJoin(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val events = graft.core.Tables.load(spark, dir, "events")
    val static = events.select(col("event_type")).distinct()
      .withColumn("type_code", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("event_type"))))
    val batch = events.join(static, Seq("event_type"))
      .groupBy("type_code")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
          .cast("double").as("sum_value"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch)
  }

  test("q136 keeps exactly one survivor per group, and it is the best-scored") {
    val kept = Dedup.qDedupKeepBest(spark, dir).cache()
    try {
      // one row per group, groups are disjoint
      assert(kept.groupBy("grp").count().filter(col("count") > 1).count() === 0)
      // survivor count = #groups + #singletons = distinct grp over corpus
      val groups = Dedup.qDedupGroups(spark, dir)
        .select(col("doc_id"), col("group_id"))
      val assigned = graft.core.Tables.load(spark, dir, "documents")
        .select(col("doc_id"))
        .join(groups, Seq("doc_id"), "left")
        .withColumn("grp", coalesce(col("group_id"), col("doc_id")))
      assert(kept.count() === assigned.select("grp").distinct().count())
      // no group member outscores its survivor
      val scored = TextAnalysis.qTextQuality(spark, dir)
        .select(col("doc_id"), col("score"))
      val best = assigned.join(scored, "doc_id")
        .groupBy("grp").agg(max(col("score")).as("best"))
      assert(kept.join(best, "grp")
        .filter(col("score") < col("best")).count() === 0)
    } finally kept.unpersist()
  }

  test("q137 budget selection is maximal and matches the global-window form") {
    val sel = Curation.q137BudgetSelect(spark, dir).cache()
    try {
      val scored = TextAnalysis.qTextQuality(spark, dir)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("score"))
      val total = scored.agg(sum("n_tokens")).head().getLong(0)
      val budget = total * 2 / 5
      // within budget
      assert(sel.agg(max("csum")).head().getLong(0) <= budget)
      // maximal: the single-partition global window yields the same set
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val global = scored.withColumn("csum", sum("n_tokens").over(w))
        .filter(col("csum") <= budget)
      assert(sel.count() === global.count())
      assert(sel.join(global.select("doc_id"), Seq("doc_id"), "left_anti")
        .count() === 0)
    } finally sel.unpersist()
  }

  test("q119 array battery: token-length conservation vs the raw text") {
    val out = TextAnalysis.q119ArrayFuncs(spark, dir)
    val joined = out.join(
      graft.core.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), length(col("text")).as("text_len")),
      "doc_id")
    // text is single-space tokenized: Σ|tok| + (n_toks − 1) == |text|
    assert(joined.filter(
      col("sum_len") + col("n_toks") - 1 =!= col("text_len")).count() === 0)
    assert(joined.filter(col("n_distinct") > col("n_toks") ||
      col("n_long") > col("n_toks")).count() === 0)
    assert(joined.filter(col("tok_min") > col("tok_max")).count() === 0)
  }
}
