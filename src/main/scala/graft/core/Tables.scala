package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided test tables
  * (`/root/repo/TESTDATA.md`): TPC-H-ish star schema + `events`,
  * `documents`, `embeddings`.
  *
  * The `events` table carries a nanosecond parquet timestamp, which the
  * vectorized Spark reader rejects (`PARQUET_TYPE_ILLEGAL`). Sessions
  * are built with `spark.sql.legacy.parquet.nanosAsLong=true` (see
  * [[graft.core.Sessions]]), so `events.ts` surfaces as epoch-nanos
  * `LongType`. NOTE: the DuckDB oracle truncates the same column to
  * microseconds (`TIMESTAMP`), so any query that compares or emits
  * event time must first truncate to micros (`ts div 1000` ==
  * DuckDB `epoch_us(ts)`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
