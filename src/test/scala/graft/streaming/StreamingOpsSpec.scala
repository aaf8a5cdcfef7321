package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import StreamingOps._

/** Streaming depth spec: watermark + event-time windows with late-data
  * drop, custom keyed state via mapGroupsWithState, and the typed
  * Aggregator (UDAF) surface. */
class StreamingOpsSpec extends SparkSuite {

  private def ts(sec: Int): Timestamp = new Timestamp(sec * 1000L)

  test("watermark drops late events; windows finalize (append mode)") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val stream = MemoryStream[(Timestamp, String)]
    val counts = windowedEventCounts(
      stream.toDF().toDF("ev_time", "event_type"), "ev_time",
      watermarkDelay = "10 seconds", windowLength = "30 seconds")
    val q = counts.writeStream.format("memory")
      .queryName("graft_windows").outputMode("append").start()
    try {
      // batch 1: events in window [0, 30)
      stream.addData((ts(5), "a"), (ts(10), "a"), (ts(20), "b"))
      q.processAllAvailable()
      // advance event time far past the watermark so [0,30) closes
      stream.addData((ts(100), "a"))
      q.processAllAvailable()
      // a VERY late event for the closed window: dropped
      stream.addData((ts(6), "a"))
      q.processAllAvailable()
      stream.addData((ts(200), "b"))
      q.processAllAvailable()

      val rows = spark.table("graft_windows")
        .select(col("w_start").cast("long"), col("event_type"), col("n"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // window [0,30): a=2 (late third 'a' dropped), b=1
      assert(rows.contains((0L, "a", 2L)), rows)
      assert(rows.contains((0L, "b", 1L)), rows)
      assert(!rows.contains((0L, "a", 3L)), s"late event not dropped: $rows")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps per-user session state across batches") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val stream = MemoryStream[UserEvent]
    val sessions = sessionize(stream.toDS())
    val q = sessions.writeStream.format("memory")
      .queryName("graft_sessions").outputMode("update").start()
    try {
      stream.addData(UserEvent(1, 10, ts(1)), UserEvent(1, 11, ts(2)),
        UserEvent(2, 20, ts(1)))
      q.processAllAvailable()
      stream.addData(UserEvent(1, 12, ts(3)))
      q.processAllAvailable()
      val latest = spark.table("graft_sessions")
        .groupBy("user_id").agg(max("events").as("events"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // state accumulated ACROSS batches: user 1 saw 2 then 3 events
      assert(latest == Map(1L -> 3L, 2L -> 1L), latest)
    } finally q.stop()
  }

  test("typed TopK aggregator: constant-size partials, correct order") {
    import spark.implicits._
    val data = Seq(
      ScoredId(1, 0.5), ScoredId(2, 0.9), ScoredId(3, 0.1),
      ScoredId(4, 0.9), ScoredId(5, 0.7), ScoredId(6, 0.3))
    val ds = spark.createDataset(data).repartition(3)
    val top3 = ds.select(new TopKAggregator(3).toColumn).collect()(0)
    // ties (0.9) break to the lower id; order is value desc
    assert(top3 == Seq(ScoredId(2, 0.9), ScoredId(4, 0.9), ScoredId(5, 0.7)))
  }

  test("windowed counts run identically as a batch plan") {
    import spark.implicits._
    val batch = Seq((ts(5), "a"), (ts(10), "a"), (ts(40), "b"))
      .toDF("ev_time", "event_type")
    val out = windowedEventCounts(batch, "ev_time", "10 seconds", "30 seconds")
      .select(col("w_start").cast("long"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((0L, "a", 2L), (30L, "b", 1L)))
  }

  test("bandRegistry flags later claimants across and within batches") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val stream = MemoryStream[BandObs]
    val verdicts = bandRegistry(stream.toDS())
    val q = verdicts.toDF().writeStream.format("memory")
      .queryName("graft_band_registry").outputMode("append").start()
    try {
      // batch 1: band 7 claimed by doc 10; doc 12 arrives in the SAME
      // batch (later id -> flagged); band 9 claimed by doc 50
      stream.addData(BandObs(7L, 10L), BandObs(7L, 12L), BandObs(9L, 50L))
      q.processAllAvailable()
      // batch 2: band 7 again (state carries) and a SMALLER id on band
      // 9 — arrival order beats id order across batches: doc 40 is NOT
      // flagged (nothing smaller had claimed band 9 when it arrived)
      stream.addData(BandObs(7L, 30L), BandObs(9L, 40L))
      q.processAllAvailable()

      val out = spark.table("graft_band_registry")
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
      assert(out === Set((10L, false), (12L, true), (50L, false),
        (30L, true), (40L, false)), out)
    } finally q.stop()
  }

  test("replay-feed memos are single-slot: a dir switch drops the superseded feed") {
    // same class as the PinnedCache storage-release contract, but for
    // the driver-side replay rows: a session benching dir A then dir B
    // must not accumulate both feeds on the heap
    val a = "/root/testdata/sf0.001"
    val b = "/root/testdata/sf0.01"
    graft.queries.StreamingQueries.eventRows(spark, a)
    graft.queries.StreamingQueries.eventRowsU(spark, a)
    assert(graft.queries.StreamingQueries.replayMemoDirs == Seq(a))
    graft.queries.StreamingQueries.eventRows(spark, b)
    graft.queries.StreamingQueries.eventRowsU(spark, b)
    assert(graft.queries.StreamingQueries.replayMemoDirs == Seq(b))
    // idempotent on the held dir (no rebuild, no growth)
    graft.queries.StreamingQueries.eventRows(spark, b)
    assert(graft.queries.StreamingQueries.replayMemoDirs == Seq(b))
  }
}
