package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** As-of join semantics on constructed data: latest-at-or-before
  * matching, inclusive ties, inner vs left behavior, and the
  * one-shuffle plan shape. */
class AsofJoinSpec extends SparkSuite {

  import spark.implicits._

  // right: state changes per key; left: lookups at various times
  private lazy val right = Seq(
    (1L, 10L, "a", 100.0),
    (1L, 20L, "b", 200.0),
    (2L, 15L, "c", 300.0)).toDF("k", "ts", "tag", "v")
  private lazy val left = Seq(
    (101L, 1L, 5L),   // before any right row -> no match
    (102L, 1L, 10L),  // tie with right ts=10 -> inclusive match "a"
    (103L, 1L, 19L),  // between -> "a"
    (104L, 1L, 25L),  // after latest -> "b"
    (105L, 2L, 40L),  // -> "c"
    (106L, 3L, 50L)   // key with no right rows -> no match
  ).toDF("id", "k", "ts")

  test("matches the latest right row at-or-before each left time (inclusive ties)") {
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("tag", "v"))
      .select($"id", $"r_tag", $"r_v").as[(Long, String, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      102L -> ("a", 100.0), 103L -> ("a", 100.0),
      104L -> ("b", 200.0), 105L -> ("c", 300.0)))
  }

  test("inner drops unmatched left rows; left keeps them with NULL payload") {
    val inner = AsofJoin.asof(left, right, "k", "ts", Seq("tag"))
    assert(inner.count() == 4)
    val outer = AsofJoin.asof(left, right, "k", "ts", Seq("tag"), inner = false)
    assert(outer.count() == 6)
    val unmatched = outer.filter($"r_tag".isNull)
      .select($"id").as[Long].collect().toSet
    assert(unmatched == Set(101L, 106L))
  }

  test("asofWithTime carries the matched right timestamp") {
    val out = AsofJoin.asofWithTime(left, right, "k", "ts", Seq("tag"))
      .select($"id", $"r_ts").as[(Long, Long)].collect().toMap
    assert(out == Map(102L -> 10L, 103L -> 10L, 104L -> 20L, 105L -> 15L))
  }

  test("NULL payload fields stay with their own row — no cross-row stitching, " +
      "no false drop in inner mode") {
    // right rows: (t=1, tag=a, v=5.0) then (t=2, tag=NULL, v=2.0)
    val nullRight = Seq(
      (1L, 1L, Option("a"), Option(5.0)),
      (1L, 2L, Option.empty[String], Option(2.0))
    ).toDF("k", "ts", "tag", "v")
    val probe = Seq((1L, 1L, 3L)).toDF("id", "k", "ts")
    val out = AsofJoin.asof(probe, nullRight, "k", "ts", Seq("tag", "v"))
      .select($"id", $"r_tag", $"r_v").collect()
    // the match is the t=2 ROW: (NULL, 2.0) — never (a, 2.0), and the
    // row survives inner mode despite its NULL first payload field
    assert(out.length == 1)
    assert(out.head.isNullAt(1) && out.head.getDouble(2) == 2.0)
  }

  test("guard rejects output-name collisions and allows r_-named right cols") {
    val collidingLeft = Seq((1L, 1L, 5L, "x")).toDF("id", "k", "ts", "r_tag")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(collidingLeft, right, "k", "ts", Seq("tag"))
    }
    // left col named r_something with a DIFFERENT right col is legal
    val ok = AsofJoin.asof(collidingLeft, right, "k", "ts", Seq("v"))
    assert(ok.columns.contains("r_v") && ok.columns.contains("r_tag"))
  }

  test("plans one exchange on the key — no range-join explosion, no cartesian") {
    val p = AsofJoin.asof(left, right, "k", "ts", Seq("tag"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), p)
    // union + window partitionBy(k): the only wide dependency
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$p")
  }
}
