package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SkewJoinSpec extends SparkSuite {

  test("salted join is result-identical to the plain join under heavy skew") {
    import spark.implicits._
    // 100k rows, 90% on one hot key
    val left = spark.range(100000)
      .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = left.join(right, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", buckets = 16)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("the shuffle key includes the salt (hot key spreads over reducers)") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = spark.range(10000).select(lit(7L).as("k"), col("id").as("v"))
      val right = Seq((7L, "only")).toDF("k", "name")
      val joined = SkewJoin.saltedEquiJoin(left, right, "k", buckets = 8)
      val p = joined.queryExecution.executedPlan.toString
      // partitioning is by (k, __salt), not k alone
      assert(p.contains("__salt"), p.take(2000))
      assert(joined.count() == 10000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
