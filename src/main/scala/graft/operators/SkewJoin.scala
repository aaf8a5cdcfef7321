package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting — the manual fallback when
  * AQE's skew-join splitting can't apply (e.g. the skewed side feeds a
  * non-shuffle operator, or the skew is in a broadcast-too-large dim).
  *
  * Standard construction: the LEFT (large, skewed) side gets a random
  * salt in [0, buckets); the RIGHT side is replicated `buckets` times
  * (explode over the salt range); the join key becomes (key, salt), so
  * one hot key spreads over `buckets` shuffle partitions instead of
  * hammering one reducer.
  *
  * Scale notes: replication multiplies the right side by `buckets` —
  * use only when right ≪ left (the usual fact⋈dim skew case) and size
  * `buckets` ≈ hotkey_rows / target_partition_rows. The salt is
  * `rand()`-based (non-deterministic is fine: any salt value joins the
  * replicated right rows identically, so results are exact).
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // Right/full outer are unsound under this construction: an
    // unmatched RIGHT row exists `buckets` times post-explode and
    // would survive as `buckets` duplicate null-extended rows.
    require(joinType == "inner" || joinType.startsWith("left"),
      s"saltedEquiJoin supports inner/left* join types, got '$joinType' " +
        "(right/full outer would duplicate unmatched right rows x buckets)")
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    // Build-side hint (round 21, guide §3.1): the salted key spreads
    // any hot key across `buckets` partitions BY CONSTRUCTION, so the
    // per-partition build side is bounded (~|right|·buckets/parts) and
    // a shuffled hash join is safe where the planner's default
    // sort-merge pays two full sorts for nothing. Result set is
    // join-strategy-independent.
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
