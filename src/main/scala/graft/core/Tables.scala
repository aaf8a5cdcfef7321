package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Parquet table loaders for the driver-provided test tables
  * (`/root/repo/TESTDATA.md`): TPC-H-ish star schema + `events`,
  * `documents`, `embeddings`.
  *
  * `events.ts` — the engine-wide contract is epoch-NANOS `LongType`
  * (every consumer truncates event time to micros via `ts div 1000`,
  * which equals DuckDB `epoch_us(ts)` on the oracle side). The
  * fixture has shipped two physical encodings of that column:
  *
  *  - parquet TIMESTAMP(NANOS): the vectorized reader rejects it
  *    unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  *    [[graft.core.Sessions]]), which surfaces it directly as
  *    epoch-nanos LongType — the contract, for free;
  *  - parquet TIMESTAMP(MICROS): surfaces as TIMESTAMP_NTZ, which
  *    this loader normalizes back to the contract
  *    (`unix_micros(cast ts as timestamp) * 1000`; the session
  *    timezone is pinned UTC so the NTZ→TZ cast is bit-identity on
  *    the stored micros).
  *
  * The normalization is a `Project` over the scan, so a downstream
  * ts-range predicate no longer reaches `PushedFilters` for the
  * micros encoding. That is a fixture-reader concession, not an
  * engine design: a production event source exposes typed event time
  * and keeps scan-level min/max pruning (see
  * [[graft.sources.EnvelopeSource]], whose own `ts` pushdown is
  * pinned by EnvelopeSourceSpec). The events queries themselves
  * shuffle on user/time-window keys, never on a raw ts range scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Analyzed-relation memo, keyed per (session, dir, table). Every
    * `spark.read.parquet` call re-lists the directory, re-reads a
    * parquet footer for schema inference, and re-analyzes the fresh
    * relation — pure fixed overhead repeated by all ~240 queries (and
    * again per bench rep) for the same ten immutable fixture tables.
    * The memoized DataFrame is an immutable analyzed plan; reusing it
    * is exactly what a user keeping `val lineitem = spark.read…`
    * around does. Sessions are weakly keyed so a stopped session's
    * relations are collectable. */
  private val memo = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String, Long), DataFrame]]()

  /** Cheap staleness fingerprint: the path's mtime (a rewritten file
    * OR a file added/removed under a directory-shaped table bumps it).
    * Keying the memo on it means a caller that regenerates a fixture
    * in place gets a FRESH relation instead of the memo serving a
    * stale file listing — the immutable bench fixtures still hit the
    * memo every time. */
  private def fingerprint(path: String): Long =
    try java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Path.of(path)).toMillis
    catch { case _: Exception => 0L }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = memo.synchronized {
      var m = memo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String, Long), DataFrame]()
        memo.put(spark, m)
      }
      m
    }
    val path = s"$dir/$name.parquet"
    perSession.computeIfAbsent((dir, name, fingerprint(path)), { _ =>
      val df = spark.read.parquet(path)
      if (name == "events" && df.schema("ts").dataType != LongType)
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      else df
    })
  }
}
