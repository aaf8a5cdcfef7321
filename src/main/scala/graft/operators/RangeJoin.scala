package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — all (point, interval) pairs with
  * `start <= ts <= end` within a key group. Spark plans the naive
  * inequality join as BroadcastNestedLoopJoin (quadratic per key);
  * this operator makes it an EQUI-join by bucketing time.
  *
  * Bucketing: with bucket width ≥ the maximum interval length, an
  * interval overlaps at most two buckets (its start's and its end's),
  * so each interval registers in ≤ 2 (key, bucket) rows and each
  * point probes exactly one. The equi-join on (key, bucket) is then
  * hash-partitioned and linear; the exact containment predicate runs
  * as a post-filter on the candidates. Registered buckets are
  * distinct per interval, so no pair duplicates.
  *
  * Scale: one shuffle on narrow (key, bucket) keys; candidate count =
  * true pairs + same-bucket near-misses (bounded by bucket width).
  * Skewed keys fall to AQE skew handling like any equi-join — the
  * property the BNLJ plan forfeits. A width below the max interval
  * length is rejected (it would silently drop pairs).
  */
object RangeJoin {

  /** `points(keyCol, tsCol, ...)` × `intervals(keyCol, startCol,
    * endCol, ...)` → matched pairs (all point columns + the chosen
    * interval columns prefixed `i_`). `bucketWidth` must be ≥ the
    * longest interval.
    *
    * `knownMaxInterval`: callers that know the longest interval a
    * priori (a schema contract, a maintained stat) pass it to skip the
    * eager guard scan over `intervals` — at scale that scan is a full
    * pass over the interval relation before the join even plans. The
    * asserted bound still validates against `bucketWidth` on the
    * driver; an honest bound keeps the no-lost-pairs guarantee, a lie
    * shifts responsibility to the caller (exactly like a declared
    * sortedness or uniqueness contract). Default = None = checked. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      intervalCols: Seq[String], bucketWidth: Long,
      knownMaxInterval: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")

    knownMaxInterval match {
      case Some(maxLen) =>
        require(maxLen <= bucketWidth,
          s"bucketWidth $bucketWidth is below the declared longest interval $maxLen; pairs would be lost")
      case None =>
        // Eager guard pass over `intervals` (column-pruned to
        // (start, end) by Catalyst, short-circuited by the limit).
        // Correctness first: an undersized width SILENTLY drops pairs.
        val tooLong = intervals
          .filter(col(endCol) - col(startCol) > bucketWidth).limit(1).count()
        require(tooLong == 0,
          s"bucketWidth $bucketWidth is below the longest interval; pairs would be lost")
    }

    val iCols = col(startCol).as("__i_start") +: col(endCol).as("__i_end") +:
      intervalCols.map(c => col(c).as(s"i_$c"))
    val buckets = intervals
      .select(col(keyCol) +: iCols: _*)
      .withColumn("__bucket",
        explode(array_distinct(array(
          floor(col("__i_start") / bucketWidth),
          floor(col("__i_end") / bucketWidth)))))
    val probes = points
      .withColumn("__bucket", floor(col(tsCol) / bucketWidth))

    probes.join(buckets, Seq(keyCol, "__bucket"))
      .filter(col(tsCol) >= col("__i_start") && col(tsCol) <= col("__i_end"))
      .drop("__bucket", "__i_start", "__i_end")
  }
}
