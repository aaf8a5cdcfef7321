package graft.core

import org.apache.spark.sql.SparkSession

/** Single place to build the local SparkSession with the confs the
  * engine needs. Keeping session-wide settings here (not inside table
  * loaders) avoids mutating global state mid-query.
  *
  *  - `nanosAsLong`: `events.parquet` carries NANOS timestamps which the
  *    vectorized reader rejects; read them as epoch-nanos LongType. The
  *    DuckDB oracle truncates the same column to µs, so event-time
  *    outputs go through `ts div 1000` (see query docs).
  *  - shuffle partitions = cores: local-mode right-sizing; on a real
  *    cluster this would be set per-job (or left to AQE coalescing).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // native expressions (canonical_json, graft_aes_ctr_decrypt,
    // vec_dot) available in every session built here
    graft.expressions.GraftFunctions.ensureRegistered(s)
    s
  }
}
