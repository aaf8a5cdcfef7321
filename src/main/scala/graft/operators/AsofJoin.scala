package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row
  * with `rightTime <= leftTime` in the same key group (the
  * quotes-to-trades / state-at-event-time operator). Spark has no
  * built-in; the naive form is a range join that explodes to
  * left×right per key.
  *
  * Implementation (composition of built-ins, preference (a) of the
  * custom-operator ladder): tag both sides, union them, and carry the
  * right side's payload forward with `last(..., ignoreNulls) OVER
  * (PARTITION BY key ORDER BY time, side ROWS UNBOUNDED PRECEDING)` —
  * then keep only left rows. Ties (equal timestamps) order the right
  * row first, so the match is INCLUSIVE (`l.ts >= r.ts`), exactly
  * DuckDB's `ASOF JOIN` semantics, which serves as the oracle twin.
  *
  * Scale: ONE shuffle on the key (the window partition), running-state
  * window (no frame re-scan), payload width = the selected right
  * columns only. At 100 TB this is the sort-merge-shaped plan a
  * hand-rolled `mapPartitions` merge would produce, but it stays
  * declarative — Catalyst prunes/pushes around it and AQE handles
  * skewed keys.
  */
object AsofJoin {

  /** Joins `right`'s `rightValueCols` (prefixed `r_`) onto `left`.
    * `inner = true` drops left rows with no prior right row (DuckDB
    * `ASOF JOIN`); `false` keeps them with NULL payload (`ASOF LEFT
    * JOIN`). Key and time column names must match across sides. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightValueCols: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => rightValueCols.contains(s"r_$c")),
      "left side already has an r_-prefixed column that would collide")

    val lTagged = left.select(
      leftCols.map(col) ++ (lit(1).as("__side") +:
        rightValueCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    val rTagged = right.select(
      leftCols.map { c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ (lit(0).as("__side") +:
        rightValueCols.map(c => col(c).as(s"__r_$c"))): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightValueCols.foldLeft(lTagged.unionByName(rTagged)) {
      (df, c) => df.withColumn(s"r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val leftRows = filled.filter(col("__side") === 1)
      .drop(("__side" +: rightValueCols.map(c => s"__r_$c")): _*)
    if (inner) leftRows.filter(col(s"r_${rightValueCols.head}").isNotNull)
    else leftRows
  }

  /** Convenience: the matched right timestamp too. */
  def asofWithTime(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightValueCols: Seq[String]): DataFrame = {
    val rWithTs = right.withColumn("__rts", col(timeCol))
    asof(left, rWithTs, keyCol, timeCol, rightValueCols :+ "__rts")
      .withColumnRenamed("r___rts", s"r_$timeCol")
  }
}
