package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Shape + plan checks for the reshape/grouping battery
  * (q75 pivot / q76 unpivot / q77 cube / q78 ntile / q80 mix report).
  * Values are oracle-checked by the DuckDB gate; these pin structural
  * invariants and plan hygiene. */
class ReshapeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("q75 pivot emits one column per declared event type, zero-filled") {
    val df = Relational.q75Pivot(spark, dir)
    assert(df.columns.toSeq ==
      "user_id" +: Relational.PivotEventTypes)
    // explicit value list => no distinct pre-scan; absent combos are 0
    val nulls = Relational.PivotEventTypes
      .map(c => df.filter(col(c).isNull).count()).sum
    assert(nulls == 0, "pivot cells must be zero-filled, never null")
  }

  test("q76 unpivot is the exact inverse of the pivot reshape") {
    val wide = Relational.q75Pivot(spark, dir)
    val long = Relational.q76Unpivot(spark, dir)
    assert(long.count() ==
      wide.count() * Relational.PivotEventTypes.size)
    val total = long.agg(sum("n_events")).head().getLong(0)
    val events = graft.core.Tables.load(spark, dir, "events").count()
    assert(total == events, s"unpivoted counts must cover all events")
  }

  test("q77 cube emits all four grouping levels with consistent totals") {
    val df = Relational.q77Cube(spark, dir).cache()
    try {
      val grand = df.filter(col("gid") === 3L)
      assert(grand.count() == 1)
      val total = grand.head().getAs[Long]("n_docs")
      val cellSum = df.filter(col("gid") === 0L)
        .agg(sum("n_docs")).head().getLong(0)
      assert(total == cellSum, "cells must sum to the grand total")
    } finally df.unpersist()
  }

  test("q78 rank outputs are stable under repartitioning") {
    val a = Relational.q78Ntile(spark, dir).collect().map(_.toString)
    val b = Relational.q78Ntile(spark, dir).repartition(7)
      .orderBy("o_orderkey").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("q80 shares sum to 1 over the corpus") {
    val s = TextAnalysis.qMixReport(spark, dir)
      .agg(sum("share")).head().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-3, s"shares must sum to ~1, got $s")
  }

  test("q89 weighted sample is stable under repartitioning") {
    val a = Sampling.q89WeightedSample(spark, dir).collect().map(_.toString)
    val b = Sampling.q89WeightedSample(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
    assert(a.length == Sampling.WeightedK)
  }

  test("q90 cumulative distribution ends at exactly 1") {
    val rows = EventAnalytics.q90Histogram(spark, dir)
      .orderBy(col("bin").desc).limit(1).collect()
    assert(rows.head.getAs[Double]("cum_frac") == 1.0)
  }

  test("q79 degree totals equal twice the verified pair count") {
    val degSum = Dedup.qDupDegree(spark, dir)
      .agg(sum("degree")).head().getLong(0)
    val pairs = Dedup.qMinhashPairs(spark, dir)
      .filter(col("jaccard") >= 0.5).count()
    assert(degSum == 2 * pairs, "each undirected pair contributes 2 degree")
  }
}
