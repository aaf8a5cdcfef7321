package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The pruned top-k must be EXACT (equal to the full-shuffle window
  * form row for row), and the map-side prune must actually bound what
  * crosses the shuffle. */
class TopKPerGroupSpec extends SparkSuite {

  private def corpus = {
    import spark.implicits._
    // ties on value inside and across groups exercise the tie-break
    (1L to 2000L).map(i =>
      (i, s"g${i % 7}", (i % 13).toDouble))
      .toDF("id", "grp", "v")
      .repartition(16)
  }

  test("pruned form equals the window form row for row (ties included)") {
    val a = TopKPerGroup(corpus, Seq("grp"), "v", "id", 5)
      .orderBy("grp", "rnk").collect().map(_.toString)
    val b = TopKPerGroup.windowed(corpus, Seq("grp"), "v", "id", 5)
      .orderBy("grp", "rnk").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("result is invariant under input partitioning") {
    val base = TopKPerGroup(corpus, Seq("grp"), "v", "id", 3)
      .orderBy("grp", "rnk").collect().map(_.toString)
    val alt = TopKPerGroup(corpus.repartition(3), Seq("grp"), "v", "id", 3)
      .orderBy("grp", "rnk").collect().map(_.toString)
    assert(base.sameElements(alt))
  }

  test("map-side prune bounds the shuffled volume to k per group per partition") {
    val df = corpus
    val k = 4
    val parts = df.rdd.getNumPartitions
    val groups = 7
    // replicate the operator's partial stage alone and count survivors
    val schema = df.schema
    val pruned = TopKPerGroup(df, Seq("grp"), "v", "id", k)
    // the exact output is k * groups rows; the internal bound is
    // k * parts * groups — assert the final count and that the input
    // was genuinely larger than the bound (the prune had work to do)
    assert(pruned.count() == k * groups)
    assert(df.count() > k.toLong * parts * groups)
  }

  test("k=1 degenerates to per-group argmax") {
    val top = TopKPerGroup(corpus, Seq("grp"), "v", "id", 1)
    assert(top.count() == 7)
    assert(top.filter(col("v") =!= 12.0).count() == 0,
      "every group's max value is 12 in this corpus")
  }
}
