package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k with MAP-SIDE pruning — the per-group
  * analogue of `TakeOrderedAndProject`.
  *
  * The declarative form (`row_number` over a window + filter) shuffles
  * EVERY row of the corpus to its group's reducer before any row can
  * be discarded — at 100 TB the shuffle IS the job. But top-k admits
  * the same partial/final split as aggregation: a row outside a
  * partition's local top-k for its group cannot be in the global
  * top-k. So this operator first prunes each partition to at most k
  * rows per group with bounded heaps (one `mapPartitions` pass —
  * genuine per-partition imperative logic, the documented case for
  * dropping below the DataFrame API), then runs the exact
  * `row_number` window on the survivors. Shuffle volume drops from
  * |corpus| to ≤ k · |partitions| · |groups| rows.
  *
  * Determinism: the heap orders by the SAME total order as the final
  * window — (value, tie) descending-by-value with the unique ascending
  * tie-break — so the partial prune is conservative-exact, not
  * approximate, and the result equals the plain window form row for
  * row. The skew caveat of group-key shuffles does not apply: at most
  * k rows per group arrive from each map partition, so a viral group
  * costs k · |partitions| reducer rows, not its corpus share.
  *
  * `valueCol` must be numeric (compared as double — exact for the
  * long/int/double columns it targets), `tieCol` a unique long. */
object TopKPerGroup {

  def apply(df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val schema = df.schema
    val gIdx = groupCols.map(schema.fieldIndex)
    val vIdx = schema.fieldIndex(valueCol)
    val tIdx = schema.fieldIndex(tieCol)
    // PriorityQueue dequeues its ordering's MAXIMUM; rank rows by
    // (-value, tie) so the root is the WORST kept row (smallest value,
    // then largest tie) and eviction is O(log k). Null values/ties are
    // not supported (the callers' metric and key columns are non-null).
    val ord: Ordering[(Double, Long, Row)] =
      Ordering.by[(Double, Long, Row), (Double, Long)] {
        case (v, t, _) => (-v, t)
      }
    val pruned = df.mapPartitions { it =>
      val heaps = mutable.Map.empty[Seq[Any], mutable.PriorityQueue[(Double, Long, Row)]]
      it.foreach { row =>
        val key = gIdx.map(row.get)
        val heap = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[(Double, Long, Row)](ord))
        val v = row.getAs[Number](vIdx).doubleValue()
        val t = row.getAs[Number](tIdx).longValue()
        if (heap.size < k) heap.enqueue((v, t, row))
        else {
          val (wv, wt, _) = heap.head
          // strictly better than the worst kept: higher value, or same
          // value with smaller tie
          if (v > wv || (v == wv && t < wt)) {
            heap.dequeue(); heap.enqueue((v, t, row))
          }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator.map(_._3))
    }(Encoders.row(schema))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).desc, col(tieCol).asc)
    pruned.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** The declarative twin (full-shuffle window form) — the reference
    * plan the pruned form must equal row-for-row. */
  def windowed(df: DataFrame, groupCols: Seq[String], valueCol: String,
      tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).desc, col(tieCol).asc)
    df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
