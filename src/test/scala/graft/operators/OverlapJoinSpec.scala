package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Overlap-join semantics on constructed data: every overlap class
  * (nested, staggered, touching endpoints, cross-bucket), no
  * duplicates from double-bucket registration, the undersized-width
  * guard on either side, parity with the naive inequality join on
  * randomized inputs, and the equi-join plan shape. */
class OverlapJoinSpec extends SparkSuite {

  import spark.implicits._

  private lazy val left = Seq(
    (1L, 1L, 0L, 10L),     // overlaps A (nested) and B (touching at 10)
    (2L, 1L, 50L, 90L),    // overlaps C (staggered across bucket edge)
    (3L, 1L, 200L, 210L),  // no partner
    (4L, 2L, 0L, 10L)      // right key, no intervals in group 2
  ).toDF("l_id", "k", "l_start", "l_end")

  private lazy val right = Seq(
    (10L, 1L, 2L, 8L),     // A: nested inside l1
    (11L, 1L, 10L, 40L),   // B: touches l1 exactly at 10 (inclusive)
    (12L, 1L, 80L, 170L),  // C: staggered over l2, crosses bucket 0→1
    (13L, 1L, 300L, 310L)  // no partner
  ).toDF("r_id", "k", "r_start", "r_end")

  private def run(width: Long, known: Option[Long] = None) =
    OverlapJoin.overlap(left, right, "k", "l_start", "l_end",
      "r_start", "r_end", Seq("r_id"), width, known)
      .select($"l_id", $"r_r_id").as[(Long, Long)].collect().toSet

  test("finds nested, staggered, and endpoint-touching overlaps; nothing else") {
    assert(run(100L) == Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("no duplicate pairs when both intervals register two buckets") {
    val out = OverlapJoin.overlap(left, right, "k", "l_start", "l_end",
      "r_start", "r_end", Seq("r_id"), 100L)
    assert(out.count() == out.distinct().count())
  }

  test("rejects a width below the longest interval on either side") {
    intercept[IllegalArgumentException] { run(80L) }  // C is length 90
    intercept[IllegalArgumentException] {
      // left side carries the longest interval here
      OverlapJoin.overlap(
        Seq((1L, 1L, 0L, 95L)).toDF("l_id", "k", "l_start", "l_end"),
        right, "k", "l_start", "l_end", "r_start", "r_end",
        Seq("r_id"), 90L)
    }
  }

  test("knownMaxInterval path produces identical pairs to the checked path") {
    assert(run(100L, known = Some(90L)) == run(100L))
  }

  test("parity with the naive inequality join on randomized intervals") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, rnd.nextInt(4).toLong, s, s + rnd.nextInt(60))
    }.toDF("l_id", "k", "l_start", "l_end")
    val r = (1 to 300).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, rnd.nextInt(4).toLong, s, s + rnd.nextInt(60))
    }.toDF("r_id", "k", "r_start", "r_end")
    val got = OverlapJoin.overlap(l, r, "k", "l_start", "l_end",
      "r_start", "r_end", Seq("r_id"), bucketWidth = 60L)
      .select($"l_id", $"r_r_id").as[(Long, Long)].collect().toSet
    val want = l.join(r, Seq("k"))
      .filter($"l_start" <= $"r_end" && $"r_start" <= $"l_end")
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("plans a hash equi-join, not a nested loop") {
    val p = OverlapJoin.overlap(left, right, "k", "l_start", "l_end",
      "r_start", "r_end", Seq("r_id"), 100L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }
}
