package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Structured Streaming spec: the export pipeline is stateless per-row
  * (parse → decrypt → transform → validate → sanitise are all row
  * expressions/UDFs), so the SAME stage composition runs unchanged as
  * `readStream → transforms → writeStream`. The reference is strictly
  * batch — "incremental" is a timestamp-ranged batch (README.md:83-84)
  * — so this is the north-star extension: a continuously exporting
  * variant with exactly the same record semantics.
  */
class StreamingPipelineSpec extends SparkSuite {

  test("pipeline stages run under structured streaming, incrementally") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)

    val stream = MemoryStream[Fixture.RawCell]
    val out = ExportPipeline.run(stream.toDF(), Fixture.Topic, ks)
    val query = ExportPipeline.records(out)
      .select("doc", "m_id", "err")
      .writeStream.format("memory").queryName("graft_stream")
      .outputMode("append").start()
    try {
      stream.addData((0L until 100L).map(i => Fixture.cell(i, dek, encKey, corrupt = false)))
      query.processAllAvailable()
      assert(spark.table("graft_stream").count() == 100)

      // incremental micro-batch: only the new rows append
      stream.addData((100L until 150L).map(i => Fixture.cell(i, dek, encKey, corrupt = false)))
      query.processAllAvailable()
      val t = spark.table("graft_stream")
      assert(t.count() == 150)
      assert(t.filter(col("doc").contains("d_oid")).count() == 75)
      assert(t.select("m_id").distinct().count() == 150)
    } finally query.stop()
  }

  test("typed skips flow as a streaming aggregation (complete mode)") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._

    val ks = Fixture.keyService
    val dek = ks.batchDataKey().plaintextDataKey
    val encKey = ks.encryptKey(Fixture.MasterKeyId, dek)

    val stream = MemoryStream[Fixture.RawCell]
    val out = ExportPipeline.run(stream.toDF(), Fixture.Topic, ks)
    val query = ExportPipeline.skipSummary(out)
      .writeStream.format("memory").queryName("graft_stream_skips")
      .outputMode("complete").start()
    try {
      stream.addData((0L until 200L).map(i => Fixture.cell(i, dek, encKey, corrupt = true)))
      query.processAllAvailable()
      val counts = spark.table("graft_stream_skips").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("ok" -> 194L, "missing:dbObject" -> 2L,
        "decrypt_failed" -> 2L, "bad_decrypted" -> 2L))
    } finally query.stop()
  }
}
