package graft.queries

import graft.SparkSuite

/** Measures the per-micro-batch `queryPlanning` cost of the two
  * DataFrame-API streaming oracle queries that do NOT use a
  * [[graft.core.PreparedTransform]] (q83 session_window, q91
  * mapGroupsWithState) — the round-13 ask: adopt the prepared-plan
  * machinery there ONLY if measurement shows per-batch planning is a
  * real cost. Structured Streaming plans these queries incrementally
  * (IncrementalExecution reuses the analyzed template across batches;
  * only optimization/physical planning re-run per batch), so unlike a
  * foreachBatch sink there is no per-batch DataFrame-API construction
  * to skip — PreparedTransform is structurally inapplicable here, and
  * the measured residual (engine-internal optimize + physical plan,
  * ~7-10 ms/batch on a hot JVM, 12-36 ms cold-JIT; sub-2% of either
  * query's bench time) is not worth restructuring for (see the
  * printed values and the scaladoc on each query).
  *
  * The assertion bound is deliberately loose (throttle-tolerant): it
  * exists to catch a structural regression (per-batch planning
  * jumping an order of magnitude), not to pin a timing. */
class StreamingPlanningSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q83/q91 per-batch queryPlanning stays far below restructuring threshold") {
    StreamingQueries.q83StreamSessions(spark, sf).collect()
    StreamingQueries.q91StreamStateCount(spark, sf).collect()
    for (id <- Seq("q83", "q91")) {
      val ms = Option(StreamingQueries.lastPlanningMs.get(id))
        .getOrElse(Vector.empty)
      assert(ms.nonEmpty, s"$id recorded no per-batch planning durations")
      val sorted = ms.sorted
      val p50 = sorted(sorted.size / 2)
      info(s"$id queryPlanning ms per batch: ${ms.mkString(", ")} (p50 $p50)")
      // 20 ms/batch was the verdict's adopt-PreparedTransform bar;
      // the loose 10x bound only trips on a structural regression
      assert(p50 <= 200,
        s"$id per-batch queryPlanning p50 ${p50}ms — investigate " +
          "(the 20ms/batch PreparedTransform bar may now be crossed)")
    }
  }
}
