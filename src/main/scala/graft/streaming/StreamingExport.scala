package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.{KeyService, SnapshotWriter}

/** The export pipeline as a CONTINUOUS stream: pipeline record output
  * under Structured Streaming, sunk through the byte-rolling encrypted
  * [[SnapshotWriter]] via `foreachBatch` — the incremental-export-as-
  * stream extension of the reference (whose "incremental" is a
  * timestamp-ranged batch, README.md:83-84).
  *
  * Each micro-batch writes into a batch-scoped directory
  * (`.../batch=<id>/`), so object files and their paired manifests are
  * grouped per micro-batch and the batch-writer's slice/roll/numbering
  * semantics (S3StreamingWriter.kt:73-187) hold verbatim within every
  * batch: exactly-once per micro-batch relies on the batch-id-scoped
  * idempotent layout, the standard Spark streaming-sink contract.
  *
  * Scale: `foreachBatch` hands over a normal DataFrame, so the writer
  * keeps its one-shuffle-on-slice, constant-memory-per-task profile;
  * nothing about the streaming wrapper adds driver materialization
  * (the accounting callback receives one row per written file).
  */
object StreamingExport {

  final case class BatchResult(batchId: Long,
      files: Seq[SnapshotWriter.FileAccounting])

  /** Starts the sink over a streaming record relation (the
    * [[graft.pipeline.ExportPipeline.records]] shape, hbase_id + doc +
    * m_* columns). `onBatch` receives each micro-batch's per-file
    * accounting after its write lands. */
  def start(records: DataFrame, cfg: SnapshotWriter.Config, keys: KeyService,
      queryName: String, onBatch: BatchResult => Unit = _ => ()): StreamingQuery =
    records.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchCfg = cfg.copy(
          outputDir = s"${cfg.outputDir}/batch=$batchId",
          manifestDir = s"${cfg.manifestDir}/batch=$batchId")
        val accounting = SnapshotWriter.write(batch, batchCfg, keys)
          .collect().toSeq
        onBatch(BatchResult(batchId, accounting))
      }
      .start()
}
