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
    * accounting after its write lands.
    *
    * `checkpointDir`: offset/commit logs land here; when None Spark
    * allocates a temp dir under java.io.tmpdir. Replay-style callers
    * (bench, specs) pass a tmpfs path — the metadata log's two
    * file-create+rename rounds per micro-batch are pure scaffolding
    * cost there, while a production incremental export points this at
    * durable storage (the logs ARE its restart contract). */
  def start(records: DataFrame, cfg: SnapshotWriter.Config, keys: KeyService,
      queryName: String, onBatch: BatchResult => Unit = _ => (),
      checkpointDir: Option[String] = None,
      writeConfs: Seq[(String, String)] = Nil): StreamingQuery = {
    val w = records.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchCfg = cfg.copy(
          outputDir = s"${cfg.outputDir}/batch=$batchId",
          manifestDir = s"${cfg.manifestDir}/batch=$batchId")
        // Stage the micro-batch through the ENGINE's already-planned
        // incremental execution (localCheckpoint runs that plan once,
        // lineage-truncated), so the writer's own query plans a leaf
        // scan instead of re-optimizing the whole pipeline tree a
        // second time per batch. Storage is freed right after the
        // write commits. writeConfs scope SQL confs to the inner
        // write only (safe sequentially: the callback runs on the
        // stream execution thread after planning).
        val staged = batch.localCheckpoint()
        val accounting = try graft.core.Sessions.withConfs(
          batch.sparkSession, writeConfs: _*) {
          SnapshotWriter.write(staged, batchCfg, keys).collect().toSeq
        } finally graft.core.Sessions.unpin(staged)
        onBatch(BatchResult(batchId, accounting))
      }
    checkpointDir.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}
