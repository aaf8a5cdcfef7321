package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The whole export job as ONE entry point — the orchestration a
  * reference user runs end-to-end (Spring Batch's job assembly,
  * JobConfiguration.kt:31-76 + the completion listener), Spark-first:
  *
  * {{{
  *   blocked-topic gate → Exporting status → source scan
  *     → ExportPipeline (parse/decrypt/transform/validate/sanitise)
  *     → SnapshotWriter (byte-rolling compress+encrypt + manifests)
  *     → per-file FilesExported increment + snapshot-sender notify
  *       (S3StreamingWriter.kt:131-132)
  *     → CompletionListener.afterJob (statuses, payloads, product
  *       status, monitoring)
  * }}}
  *
  * Failure classes map to the reference's terminal statuses
  * (JobCompletionNotificationListener.kt:69-91): blocked topic →
  * Blocked_Topic, missing table → Table_Unavailable (both COUNT AS
  * SUCCESS in the run-level fold), anything else → Export_Failed.
  *
  * Scale: the driver does gate/status/completion only; scan → pipeline
  * → writer is one distributed lineage with a single shuffle (the
  * writer's slice repartition). The per-file loop walks the writer's
  * accounting rows (one per written file), never record data.
  */
object ExportJob {

  final case class Result(
      outcome: Control.JobOutcome,
      completionStatus: Control.ExportCompletionStatus,
      files: Seq[SnapshotWriter.FileAccounting],
      skips: Map[String, Long])

  def run(spark: SparkSession,
      source: SparkSession => DataFrame,
      cfg: Completion.Config,
      writerCfg: SnapshotWriter.Config,
      keys: KeyService,
      exportStatus: Control.ExportStatusService,
      productStatus: Completion.ProductStatusService,
      messaging: Completion.SqsMessagingService,
      sns: Completion.SnsPublishingService,
      blockedTopics: String = "",
      snapshotType: String = "full"): Result = {

    val listener = new Completion.CompletionListener(
      cfg, exportStatus, productStatus, messaging, sns)

    def terminate(outcome: Control.JobOutcome,
        files: Seq[SnapshotWriter.FileAccounting],
        skips: Map[String, Long]): Result =
      Result(outcome, listener.afterJob(outcome), files, skips)

    try {
      Control.checkTopicNotBlocked(cfg.topicName, blockedTopics)
      exportStatus.setStatus(cfg.topicName, Control.CollectionStatus.Exporting)

      val out = ExportPipeline.run(source(spark), cfg.topicName, keys, snapshotType)
      val files = SnapshotWriter.write(ExportPipeline.records(out), writerCfg, keys)
        .collect().toSeq
      // per-file accounting, in the writer's own order
      // (S3StreamingWriter.kt:131-132): count increment + FIFO
      // snapshot-sender message carrying the object's full path
      files.foreach { fa =>
        exportStatus.incrementExportedCount(cfg.topicName)
        messaging.notifySnapshotSender(s"${writerCfg.outputDir}/${fa.file}")
      }
      val skips = ExportPipeline.skipSummary(out).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      terminate(Control.JobOutcome(completed = true), files, skips)
    } catch {
      case _: Control.BlockedTopicException =>
        terminate(Control.JobOutcome(completed = false, blockedTopic = true),
          Nil, Map.empty)
      case _: Control.TableUnavailableException =>
        terminate(Control.JobOutcome(completed = false, tableUnavailable = true),
          Nil, Map.empty)
      case _: Exception =>
        terminate(Control.JobOutcome(completed = false), Nil, Map.empty)
    }
  }
}
