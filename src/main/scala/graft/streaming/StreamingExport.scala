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

  /** Starts the sink over a streaming relation. With `mapBatch = None`
    * the stream must already carry the record shape (the
    * [[graft.pipeline.ExportPipeline.records]] columns, hbase_id +
    * doc + m_*). With `mapBatch = Some(f)` the stream carries the RAW
    * relation and `f` lifts each micro-batch all the way to the
    * SINK-INPUT shape ([[SnapshotWriter.shaped]]) INSIDE the sink
    * query — the foreachBatch idiom for a heavy transform: the
    * engine's incremental plan stays leaf-thin (it plans only the
    * source), and the transform + shuffle + write optimize and
    * execute as ONE query per batch, so the heavy tree is planned
    * exactly once per batch instead of once by the engine and again
    * by the sink. Pair `f` with a [[graft.core.PreparedTransform]] to
    * also skip the per-batch construction/analysis cost. `onBatch`
    * receives each micro-batch's per-file accounting after its write
    * lands.
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
      writeConfs: Seq[(String, String)] = Nil,
      mapBatch: Option[DataFrame => DataFrame] = None): StreamingQuery = {
    val w = records.writeStream
      .outputMode("append")
      .queryName(queryName)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val batchCfg = cfg.copy(
          outputDir = s"${cfg.outputDir}/batch=$batchId",
          manifestDir = s"${cfg.manifestDir}/batch=$batchId")
        // writeConfs scope SQL confs to the inner write only (safe
        // sequentially: the callback runs on the stream execution
        // thread after planning).
        val accounting = mapBatch match {
          case Some(f) =>
            // raw-relation mode: the transform lives in the sink
            // query — no staging needed, the batch is a leaf already,
            // and f's output is sink-shaped so the write adds no
            // further plan construction
            graft.core.Sessions.withConfs(
              batch.sparkSession, writeConfs: _*) {
              SnapshotWriter.writeShaped(f(batch.toDF()), batchCfg, keys)
                .collect().toSeq
            }
          case None =>
            // record-relation mode: stage the micro-batch through the
            // ENGINE's already-planned incremental execution
            // (localCheckpoint runs that plan once, lineage-truncated),
            // so the writer's own query plans a leaf scan instead of
            // re-optimizing the whole pipeline tree a second time per
            // batch. Storage is freed right after the write commits.
            val staged = batch.localCheckpoint()
            try graft.core.Sessions.withConfs(
              batch.sparkSession, writeConfs: _*) {
              SnapshotWriter.write(staged, batchCfg, keys).collect().toSeq
            } finally graft.core.Sessions.unpin(staged)
        }
        onBatch(BatchResult(batchId, accounting))
      }
    checkpointDir.foreach(w.option("checkpointLocation", _))
    w.start()
  }
}
