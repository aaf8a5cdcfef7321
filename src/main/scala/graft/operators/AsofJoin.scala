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
    * JOIN`). Key and time column names must match across sides.
    *
    * Ties among RIGHT rows sharing the same (key, time) resolve
    * arbitrarily (the window order is (time, side) only) — the same
    * ambiguity DuckDB's ASOF JOIN has. Deduplicate the right side on
    * (key, time) first if its payload must be deterministic there. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightValueCols: Seq[String], inner: Boolean = true): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightValueCols.exists(c => leftCols.contains(s"r_$c")),
      "left side already has an r_-prefixed output column that would collide")

    // The right payload rides as ONE struct, so the window's
    // last(ignoreNulls) picks the matched right ROW atomically — a
    // per-column last() would stitch values from DIFFERENT right rows
    // whenever a payload field is NULL, and a NULL head field would
    // falsely drop the row in inner mode. The struct is non-null on
    // every right row (even all-NULL payloads), null on left rows.
    val rStruct = struct(rightValueCols.map(col): _*)
    val lTagged = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("__side"),
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r")): _*)
    val rTagged = right.select(
      leftCols.map { c =>
        if (c == keyCol || c == timeCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(lit(0).as("__side"), rStruct.as("__r")): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lTagged.unionByName(rTagged)
      .withColumn("__rm", last(col("__r"), ignoreNulls = true).over(w))
    val matched = if (inner) filled.filter(col("__rm").isNotNull) else filled
    val leftRows = matched.filter(col("__side") === 1)
    rightValueCols.foldLeft(leftRows) { (df, c) =>
      df.withColumn(s"r_$c", col("__rm").getField(c))
    }.drop("__side", "__r", "__rm")
  }

  /** Convenience: the matched right timestamp too. */
  def asofWithTime(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, rightValueCols: Seq[String]): DataFrame = {
    val rWithTs = right.withColumn("__rts", col(timeCol))
    asof(left, rWithTs, keyCol, timeCol, rightValueCols :+ "__rts")
      .withColumnRenamed("r___rts", s"r_$timeCol")
  }
}
