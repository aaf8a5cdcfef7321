package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Range-join semantics on constructed data: containment matching
  * across bucket boundaries, inclusive endpoints, the too-long-interval
  * guard, and the equi-join (not nested-loop) plan shape. */
class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 1L, 5L),    // inside interval A
    (2L, 1L, 10L),   // on A's end boundary (inclusive)
    (3L, 1L, 11L),   // just outside A
    (4L, 1L, 95L),   // inside B, which CROSSES a bucket boundary (width 100)
    (5L, 1L, 105L),  // inside B, other side of the boundary
    (6L, 2L, 5L)     // right key-group, no intervals there
  ).toDF("p_id", "k", "ts")

  private lazy val intervals = Seq(
    (10L, 1L, 0L, 10L),   // A: [0, 10]
    (11L, 1L, 90L, 150L)  // B: [90, 150] spans buckets 0 and 1
  ).toDF("int_id", "k", "start_ts", "end_ts")

  test("matches exactly the contained points, inclusive endpoints, across buckets") {
    val out = RangeJoin.pointInInterval(points, intervals, "k", "ts",
      "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L)
      .select($"p_id", $"i_int_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (2L, 10L), (4L, 11L), (5L, 11L)))
  }

  test("no duplicate pairs when an interval registers in two buckets") {
    val out = RangeJoin.pointInInterval(points, intervals, "k", "ts",
      "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L)
    assert(out.count() == out.distinct().count())
  }

  test("rejects a bucket width below the longest interval instead of dropping pairs") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "k", "ts",
        "start_ts", "end_ts", Seq("int_id"), bucketWidth = 50L)
    }
  }

  test("knownMaxInterval produces identical pairs to the checked path") {
    val declared = RangeJoin.pointInInterval(points, intervals, "k", "ts",
      "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L,
      knownMaxInterval = Some(60L))
      .select($"p_id", $"i_int_id").as[(Long, Long)].collect().toSet
    val checked = RangeJoin.pointInInterval(points, intervals, "k", "ts",
      "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L)
      .select($"p_id", $"i_int_id").as[(Long, Long)].collect().toSet
    assert(declared == checked)
  }

  test("knownMaxInterval runs no job over the interval relation at call time") {
    // a lineage that throws on ANY execution: the checked path's guard
    // scan trips it, the declared path builds the plan without a job
    val boom = udf { (x: Long) =>
      throw new RuntimeException("guard scan executed"); x
    }
    val poisoned = intervals.withColumn("end_ts", boom(col("end_ts")))
    intercept[Exception] {
      RangeJoin.pointInInterval(points, poisoned, "k", "ts",
        "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L)
    }
    RangeJoin.pointInInterval(points, poisoned, "k", "ts",
      "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L,
      knownMaxInterval = Some(60L)) // no action -> no throw
  }

  test("rejects a declared bound above the bucket width without scanning") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, intervals, "k", "ts",
        "start_ts", "end_ts", Seq("int_id"), bucketWidth = 50L,
        knownMaxInterval = Some(60L))
    }
  }

  test("plans a hash equi-join, never a nested-loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "k", "ts",
      "start_ts", "end_ts", Seq("int_id"), bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }
}
