package graft.core

import graft.SparkSuite

/** Pins the managed-cache storage contract: replacing a [[Sessions
  * .PinnedCache]] entry (an sf-dir switch) must FREE the superseded
  * artifact's localCheckpoint blocks — `DataFrame.unpersist()` alone
  * is a no-op on them (the ADVICE-flagged leak), so the registry
  * releases the underlying checkpointed RDDs. Assertions track the
  * specific RDDs, not global storage counts, so concurrent suites
  * sharing the session cannot flake this. */
class PinnedCacheSpec extends SparkSuite {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def build(tag: String) = {
    import spark.implicits._
    Sessions.pin(Seq((tag, 1), (tag, 2)).toDF("t", "x"), 1)
  }

  test("a dir switch frees the superseded localCheckpoint blocks") {
    val cache = new Sessions.PinnedCache
    val a = cache.getOrElseUpdate("dirA")(build("a"))
    val idsA = Sessions.pinnedRddIds(a).map(_.id)
    assert(idsA.nonEmpty, "pinned artifact must plan as a LogicalRDD leaf")
    assert(idsA.forall(persistedIds.contains),
      "localCheckpoint blocks registered while the entry is live")

    // switch 1: dirA -> dirB frees A's blocks
    val b = cache.getOrElseUpdate("dirB")(build("b"))
    val idsB = Sessions.pinnedRddIds(b).map(_.id)
    assert(idsA.forall(!persistedIds.contains(_)),
      s"superseded dirA blocks must be freed: ${idsA.filter(persistedIds.contains)}")
    assert(idsB.forall(persistedIds.contains))

    // switch 2: dirB -> dirA again frees B's blocks (bounded at one
    // live artifact no matter how often a long-lived session flips)
    val a2 = cache.getOrElseUpdate("dirA")(build("a2"))
    val idsA2 = Sessions.pinnedRddIds(a2).map(_.id)
    assert(idsB.forall(!persistedIds.contains(_)))
    assert(idsA2.forall(persistedIds.contains))

    // same dir: cache hit, nothing rebuilt or freed
    assert(cache.getOrElseUpdate("dirA")(fail("must not rebuild")) eq a2)

    cache.clear()
    assert(idsA2.forall(!persistedIds.contains(_)),
      "clear() releases the last artifact")
  }

  test("unpin also handles plain .cache()d relations") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x").cache()
    df.count()
    assert(df.storageLevel.useMemory)
    Sessions.unpin(df)
    assert(!df.storageLevel.useMemory)
  }
}
