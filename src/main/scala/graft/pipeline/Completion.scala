package graft.pipeline

import scala.collection.mutable.ListBuffer

/** Completion fan-out with EXACT message payloads + product status —
  * the rendering half of the reference's after-job listener that
  * [[Control.completionEvents]] only decides. Every payload below is
  * byte-identical to the reference's own golden tests
  * (SQSMessagingServiceTest.kt, SnsServiceImplTest.kt), including the
  * raw-string indentation quirks of the Kotlin sources: the SQS bodies
  * are `trimMargin`-shaped, the ADG/monitoring payloads keep their
  * 16-space source indentation because the reference never trims them
  * (SnsServiceImpl.kt:50-115 — `trimIndent` is a no-op when the first
  * line starts at column 0).
  *
  * Transport is behind two one-method seams ([[SqsClient]] /
  * [[SnsClient]]) with recording impls for tests; every send retries
  * under [[Retry]] exactly like the reference's `@Retryable` (5
  * attempts, ×2 backoff). Product status mirrors
  * DynamoDBProductStatusService.kt: key (Correlation_Id, DataProduct=
  * "HTME"), `SET Status = :x`, ALL_NEW result.
  */
object Completion {

  /** The reference's property surface feeding the payloads
    * (SQSMessagingService.kt:96-126, SnsServiceImpl.kt:160-180,
    * JobCompletionNotificationListener.kt:150-168). */
  final case class Config(
      topicName: String,
      snapshotType: String,
      exportDate: String,
      correlationId: String,
      s3Prefix: String = "",
      shutdownFlag: Boolean = true,
      reprocessFiles: Boolean = false,
      triggerSnapshotSender: Boolean = true,
      triggerAdg: Boolean = false,
      sendToRis: Boolean = false,
      pdmCommonModelSitePrefix: String = "",
      snapshotSenderQueueUrl: String = "",
      dataEgressQueueUrl: String = "",
      fullTopicArn: String = "",
      incrementalTopicArn: String = "",
      monitoringTopicArn: String = "")

  // ------------------------------------------------------- transport

  final case class SqsMessage(queueUrl: String, body: String,
      messageGroupId: Option[String])
  final case class SnsMessage(topicArn: String, payload: String)

  trait SqsClient { def send(message: SqsMessage): Unit }
  trait SnsClient { def publish(message: SnsMessage): Unit }

  final class RecordingSqs extends SqsClient {
    val sent = new ListBuffer[SqsMessage]
    override def send(message: SqsMessage): Unit = synchronized { sent += message }
  }
  final class RecordingSns extends SnsClient {
    val published = new ListBuffer[SnsMessage]
    override def publish(message: SnsMessage): Unit = synchronized { published += message }
  }

  // -------------------------------------------------------- payloads

  /** SQS snapshot-sender body (SQSMessagingService.kt:77-87). */
  private[pipeline] def snapshotSenderMessage(cfg: Config, prefix: String): String =
    s"""{
       |   "shutdown_flag": "${cfg.shutdownFlag}",
       |   "correlation_id": "${cfg.correlationId}",
       |   "topic_name": "${cfg.topicName}",
       |   "export_date": "${cfg.exportDate}",
       |   "reprocess_files": "${cfg.reprocessFiles}",
       |   "s3_full_folder": "$prefix",
       |   "snapshot_type": "${cfg.snapshotType}"
       |}""".stripMargin

  /** SQS no-files-exported body (SQSMessagingService.kt:89-99). */
  private[pipeline] def noFilesExportedMessage(cfg: Config): String =
    s"""{
       |   "shutdown_flag": "${cfg.shutdownFlag}",
       |   "correlation_id": "${cfg.correlationId}",
       |   "topic_name": "${cfg.topicName}",
       |   "export_date": "${cfg.exportDate}",
       |   "reprocess_files": "${cfg.reprocessFiles}",
       |   "snapshot_type": "${cfg.snapshotType}",
       |   "files_exported": 0
       |}""".stripMargin

  /** SQS data-egress RIS body (SQSMessagingService.kt:102-116). */
  private[pipeline] def dataEgressRisMessage(key: String): String =
    s"""{
       |    "Records": [
       |        {
       |            "s3": {
       |                "object": {
       |                    "key": "$key"
       |                }
       |            }
       |        }
       |    ]
       |}""".stripMargin

  /** SNS ADG-trigger payload (SnsServiceImpl.kt:50-76). The reference's
    * `trimIndent()` removes nothing (first line `{` is at column 0),
    * so the 16/24/26-space source indentation IS the payload. */
  private[pipeline] def exportCompletedPayload(cfg: Config): String =
    s"""{
                "overrides": {
                        "Name": "analytical-dataset-generator-${cfg.snapshotType}"
                },
                "additional_step_args": {
                        "submit-job": [
                          "--correlation_id", "${cfg.correlationId}",
                          "--s3_prefix", "${cfg.s3Prefix}",
                          "--snapshot_type", "${cfg.snapshotType}",
                          "--export_date", "${cfg.exportDate}"
                        ],
                        "courtesy-flush": [
                          "--correlation_id", "${cfg.correlationId}",
                          "--s3_prefix", "${cfg.s3Prefix}",
                          "--snapshot_type", "${cfg.snapshotType}",
                          "--export_date", "${cfg.exportDate}"
                        ],
                        "send_notification": [
                          "--correlation_id", "${cfg.correlationId}",
                          "--s3_prefix", "${cfg.s3Prefix}",
                          "--snapshot_type", "${cfg.snapshotType}",
                          "--export_date", "${cfg.exportDate}"
                        ]
                    }
                }"""

  /** SNS topic-failed monitoring payload (SnsServiceImpl.kt:78-99 —
    * untrimmed raw string, indentation preserved). */
  private[pipeline] def failedTopicMonitoringPayload(cfg: Config): String =
    s"""{
                "severity": "High",
                "notification_type": "Warning",
                "slack_username": "HTME",
                "title_text": "${cfg.snapshotType.capitalize} - Collection failed",
                "custom_elements": [
                    {
                        "key": "Export date",
                        "value": "${cfg.exportDate}"
                    },
                    {
                        "key": "Correlation Id",
                        "value": "${cfg.correlationId}"
                    },
                    {
                        "key": "Topic",
                        "value": "${cfg.topicName}"
                    }
                ]
            }"""

  /** Status → description, severity, notification type
    * (ExportCompletionStatus.kt:3-8, SnsServiceImpl.kt:117-139). */
  private[pipeline] def statusDescription(s: Control.ExportCompletionStatus): String = {
    import Control.ExportCompletionStatus._
    s match {
      case CompletedSuccessfully => "success"
      case CompletedUnsuccessfully => "failed"
      case InProgress => "in progress"
      case NotCompleted => "not completed"
    }
  }

  /** SNS completion monitoring payload (SnsServiceImpl.kt:101-115). */
  private[pipeline] def completionMonitoringPayload(cfg: Config,
      status: Control.ExportCompletionStatus): String = {
    val success = status == Control.ExportCompletionStatus.CompletedSuccessfully
    val severity = if (success) "Critical" else "High"
    val notificationType = if (success) "Information" else "Warning"
    s"""{
                "severity": "$severity",
                "notification_type": "$notificationType",
                "slack_username": "HTME",
                "title_text": "${cfg.snapshotType.capitalize} - Export finished - ${statusDescription(status)}",
                "custom_elements": [
                    {
                        "key": "Export date",
                        "value": "${cfg.exportDate}"
                    },
                    {
                        "key": "Correlation Id",
                        "value": "${cfg.correlationId}"
                    }
                ]
            }"""
  }

  // -------------------------------------------------------- services

  /** SQS messaging (MessagingService.kt / SQSMessagingService.kt):
    * snapshot-sender sends are FIFO (group id = topic with dots →
    * underscores) and gated on the trigger flag; data-egress sends are
    * plain. Every send retries per the reference's `@Retryable`. */
  final class SqsMessagingService(cfg: Config, sqs: SqsClient,
      policy: Retry.Policy = Retry.Policy(), sleeper: Long => Unit = Thread.sleep) {

    private def fifoGroupId = cfg.topicName.replace(".", "_")

    def notifySnapshotSender(prefix: String): Unit =
      Retry.withRetry(policy, sleeper) {
        if (cfg.triggerSnapshotSender)
          sqs.send(SqsMessage(cfg.snapshotSenderQueueUrl,
            snapshotSenderMessage(cfg, prefix), Some(fifoGroupId)))
      }

    def notifySnapshotSenderNoFilesExported(): Unit =
      Retry.withRetry(policy, sleeper) {
        if (cfg.triggerSnapshotSender)
          sqs.send(SqsMessage(cfg.snapshotSenderQueueUrl,
            noFilesExportedMessage(cfg), Some(fifoGroupId)))
      }

    def sendDataEgressMessage(prefix: String): Unit =
      Retry.withRetry(policy, sleeper) {
        sqs.send(SqsMessage(cfg.dataEgressQueueUrl,
          dataEgressRisMessage(prefix), None))
      }
  }

  /** SNS publishing (SnsService.kt / SnsServiceImpl.kt): the ADG
    * trigger goes to the snapshot-type-selected completion arn, the
    * monitoring messages to the monitoring arn; a blank arn publishes
    * nothing (SnsServiceImpl.kt:44-48). */
  final class SnsPublishingService(cfg: Config, sns: SnsClient,
      policy: Retry.Policy = Retry.Policy(), sleeper: Long => Unit = Thread.sleep) {

    private def targetTopicArn: String =
      if (cfg.snapshotType == "full") cfg.fullTopicArn else cfg.incrementalTopicArn

    private def sendMessage(arn: String, payload: String): Unit =
      Retry.withRetry(policy, sleeper) {
        if (arn.nonEmpty) sns.publish(SnsMessage(arn, payload))
      }

    def sendExportCompletedSuccessfullyMessage(): Unit =
      sendMessage(targetTopicArn, exportCompletedPayload(cfg))

    def sendTopicFailedMonitoringMessage(): Unit =
      sendMessage(cfg.monitoringTopicArn, failedTopicMonitoringPayload(cfg))

    def sendCompletionMonitoringMessage(status: Control.ExportCompletionStatus): Unit =
      sendMessage(cfg.monitoringTopicArn, completionMonitoringPayload(cfg, status))
  }

  // -------------------------------------------------- product status

  /** ProductStatusService.kt: terminal product status for the run. */
  trait ProductStatusService {
    def setCompletedStatus(): Unit
    def setFailedStatus(): Unit
  }

  /** DynamoDB-shaped local impl (DynamoDBProductStatusService.kt):
    * one item keyed (Correlation_Id, DataProduct="HTME"), updated with
    * `SET Status = :x`, returning the ALL_NEW attribute map. */
  final class InMemoryProductStatusService(correlationId: String,
      policy: Retry.Policy = Retry.Policy(), sleeper: Long => Unit = Thread.sleep)
      extends ProductStatusService {

    private val table =
      scala.collection.mutable.Map.empty[(String, String), Map[String, String]]

    private def setStatus(status: String): Map[String, String] =
      Retry.withRetry(policy, sleeper) {
        synchronized {
          val key = (correlationId, "HTME")
          val updated = table.getOrElse(key,
            Map("Correlation_Id" -> correlationId, "DataProduct" -> "HTME")) +
            ("Status" -> status)
          table(key) = updated
          updated // ALL_NEW
        }
      }

    override def setCompletedStatus(): Unit = setStatus("COMPLETED")
    override def setFailedStatus(): Unit = setStatus("FAILED")

    def currentStatus: Option[String] =
      synchronized(table.get((correlationId, "HTME")).flatMap(_.get("Status")))
  }

  // --------------------------------------------------- the listener

  /** The after-job orchestration, call-for-call in the reference's
    * order (JobCompletionNotificationListener.kt:52-67): terminal
    * export status, snapshot-sender no-files message, topic-failed
    * monitoring, then the run-level completion fold feeding the ADG
    * trigger, RIS + PDM data-egress messages, product status, and the
    * completion monitoring message. */
  final class CompletionListener(cfg: Config,
      exportStatus: Control.ExportStatusService,
      productStatus: ProductStatusService,
      messaging: SqsMessagingService,
      sns: SnsPublishingService) {

    def afterJob(outcome: Control.JobOutcome): Control.ExportCompletionStatus = {
      import Control.ExportCompletionStatus._
      exportStatus.setStatus(cfg.topicName, Control.terminalStatus(outcome))
      if (outcome.completed && exportStatus.exportedFilesCount(cfg.topicName) == 0)
        messaging.notifySnapshotSenderNoFilesExported()
      if (!outcome.completed)
        sns.sendTopicFailedMonitoringMessage()

      val completionStatus = Control.exportCompletionStatus(exportStatus.statuses())
      val terminal = completionStatus == CompletedSuccessfully ||
        completionStatus == CompletedUnsuccessfully

      if (completionStatus == CompletedSuccessfully && cfg.triggerAdg)
        sns.sendExportCompletedSuccessfullyMessage()
      if (outcome.completed && cfg.sendToRis &&
          exportStatus.exportedFilesCount(cfg.topicName) > 0)
        messaging.sendDataEgressMessage(s"${cfg.s3Prefix}/${cfg.topicName}-")
      if (cfg.pdmCommonModelSitePrefix.nonEmpty &&
          cfg.snapshotType == "incremental" && terminal)
        messaging.sendDataEgressMessage(cfg.pdmCommonModelSitePrefix)
      completionStatus match {
        case CompletedSuccessfully => productStatus.setCompletedStatus()
        case CompletedUnsuccessfully => productStatus.setFailedStatus()
        case _ => ()
      }
      if (terminal)
        sns.sendCompletionMonitoringMessage(completionStatus)
      completionStatus
    }
  }
}
