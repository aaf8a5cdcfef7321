package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — all (left, right) interval pairs that
  * overlap (`l.start <= r.end AND r.start <= l.end`) within a key
  * group. The generalization of [[RangeJoin]] from point-in-interval
  * to interval×interval; Spark plans the naive double-inequality join
  * as BroadcastNestedLoopJoin (quadratic per key), this operator makes
  * it an EQUI-join by bucketing time on both sides.
  *
  * Bucketing: with bucket width ≥ the maximum interval length on
  * EITHER side, every interval's covered bucket range
  * `[floor(s/w), floor(e/w)]` has at most two elements, both of which
  * it registers. Two overlapping intervals both contain the instant
  * `max(l.start, r.start)`, so both register its bucket — the
  * equi-join on (key, bucket) finds every overlapping pair. A pair
  * sharing two buckets would surface twice, so the post-filter keeps
  * only the match at the canonical bucket
  * `floor(max(l.start, r.start) / w)` — duplicates are impossible by
  * construction, not by a `distinct` (which would shuffle the whole
  * candidate set a second time).
  *
  * Scale: one shuffle on narrow (key, bucket) keys with ≤ 2× row
  * replication per side; candidate volume = true pairs + same-bucket
  * near-misses (bounded by width). Skewed keys fall to AQE skew
  * handling like any equi-join. As in RangeJoin, an undersized width
  * would silently drop pairs, so it is rejected — eagerly measured
  * unless the caller declares `knownMaxInterval` (a schema contract /
  * maintained stat) to skip the guard scans at scale.
  */
object OverlapJoin {

  /** `left(keyCol, lStart, lEnd, ...)` × `right(keyCol, rStart, rEnd,
    * ...)` → overlapping pairs: all left columns + the chosen right
    * columns prefixed `r_`. Column names across the two inputs may
    * collide only on `keyCol`. */
  def overlap(left: DataFrame, right: DataFrame, keyCol: String,
      lStartCol: String, lEndCol: String,
      rStartCol: String, rEndCol: String,
      rightCols: Seq[String], bucketWidth: Long,
      knownMaxInterval: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    knownMaxInterval match {
      case Some(maxLen) =>
        require(maxLen <= bucketWidth,
          s"bucketWidth $bucketWidth is below the declared longest interval $maxLen; pairs would be lost")
      case None =>
        val tooLong = left
          .filter(col(lEndCol) - col(lStartCol) > bucketWidth).limit(1)
          .union(right
            .filter(col(rEndCol) - col(rStartCol) > bucketWidth).limit(1))
          .limit(1).count()
        require(tooLong == 0,
          s"bucketWidth $bucketWidth is below the longest interval; pairs would be lost")
    }

    def withBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bucket", explode(array_distinct(array(
        floor(col(s) / bucketWidth), floor(col(e) / bucketWidth)))))

    val rCols = col(rStartCol).as("__r_start") +: col(rEndCol).as("__r_end") +:
      rightCols.map(c => col(c).as(s"r_$c"))
    val r = withBuckets(right.select(col(keyCol) +: rCols: _*),
      "__r_start", "__r_end")
    val l = withBuckets(left, lStartCol, lEndCol)

    l.join(r, Seq(keyCol, "__bucket"))
      .filter(col(lStartCol) <= col("__r_end") &&
        col("__r_start") <= col(lEndCol) &&
        col("__bucket") ===
          floor(greatest(col(lStartCol), col("__r_start")) / bucketWidth))
      .drop("__bucket", "__r_start", "__r_end")
  }
}
