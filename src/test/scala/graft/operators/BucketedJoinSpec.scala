package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Co-located joins via bucketing: writing both join sides bucketed by
  * the join key lets Spark plan a sort-merge join with NO Exchange on
  * either side — at 100 TB this turns the nightly fact⋈fact join from
  * a full double shuffle into local merges. */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed-by-key tables join without a shuffle") {
    val wh = Files.createTempDirectory("graft-bucketed").toFile.getAbsolutePath
    val dir = "/root/testdata/sf0.001"
    val li = graft.core.Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = graft.core.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite")
      .option("path", s"$wh/li_b").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite")
      .option("path", s"$wh/o_b").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    // at sf0.001 the sides fit a broadcast; disable it so the planner
    // faces the shuffle-or-bucket decision a 100 TB fact⋈fact join has
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(3000))
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n${p.take(3000)}")
      // and produces the same result as the unbucketed join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
