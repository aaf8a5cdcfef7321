package graft.queries

import graft.SparkSuite

/** Scale contract for the IVF coarse quantizer: the driver-side seed
  * collect is O(K) with K = IvfSeedCount CONSTANT in N. Round 2's
  * stride rule (`vec_id % 53 == 0`) collected N/53 rows — linear in
  * the table — which at 1 B vectors is ~19 M embeddings through the
  * driver and a plan literal Catalyst cannot serialize. The hash-
  * sample rule (`ORDER BY knuth_hash(vec_id) LIMIT K`) plans as
  * TakeOrderedAndProject: per-partition partial top-K, no global
  * sort, exactly K rows at the driver at any N. */
class IvfScaleSpec extends SparkSuite {

  test("quantizer seed count == K at every SF (independent of N)") {
    val k = Similarity.IvfSeedCount
    // 500 rows vs 2000 rows: same K seeds either way.
    val small = new Similarity.IvfQuantizer(spark, "/root/testdata/sf0.001")
    val large = new Similarity.IvfQuantizer(spark, "/root/testdata/sf0.1")
    assert(small.seedIds.size == k, s"sf0.001 seeds = ${small.seedIds.size}")
    assert(large.seedIds.size == k, s"sf0.1 seeds = ${large.seedIds.size}")
  }

  test("seed selection is deterministic (stable across invocations)") {
    val a = new Similarity.IvfQuantizer(spark, "/root/testdata/sf0.001").seedIds
    val b = new Similarity.IvfQuantizer(spark, "/root/testdata/sf0.001").seedIds
    assert(a == b)
    assert(a == a.sorted, "seedIds must be ascending (fold tiebreak order)")
  }

  test("seed selection plans a TakeOrderedAndProject, not a global sort") {
    import org.apache.spark.sql.functions._
    val n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = n
      .orderBy(pmod(pmod(col("vec_id"), lit(2147483648L)) * lit(2654435761L),
        lit(4294967296L)), col("vec_id"))
      .limit(Similarity.IvfSeedCount)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
