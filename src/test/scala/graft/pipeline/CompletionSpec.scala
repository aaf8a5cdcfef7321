package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Completion._
import graft.pipeline.Control.{ExportCompletionStatus, InMemoryStatusService, JobOutcome}

/** Golden tests for the completion fan-out payloads + product status,
  * mirroring the reference's own service tests byte-for-byte
  * (SQSMessagingServiceTest.kt, SnsServiceImplTest.kt,
  * DynamoDBProductStatusServiceTest.kt) and the listener flows of
  * JobCompletionNotificationListenerTest.kt. */
class CompletionSpec extends AnyFunSuite {

  private val noSleep: Long => Unit = _ => ()

  // the SQSMessagingServiceTest.kt property surface
  private val sqsCfg = Config(
    topicName = "db.database.collection",
    snapshotType = "incremental",
    exportDate = "2020-06-05",
    correlationId = "correlation-id",
    shutdownFlag = true,
    reprocessFiles = false,
    triggerSnapshotSender = true,
    snapshotSenderQueueUrl = "http://aws:4566/000000000000/snapshot-sender-queue",
    dataEgressQueueUrl = "http://aws:4566/000000000000/data-egress-queue")

  // the SnsServiceImplTest.kt property surface
  private val snsCfg = Config(
    topicName = "test_topic",
    snapshotType = "full",
    exportDate = "2020-12-12",
    correlationId = "correlation.id",
    s3Prefix = "prefix",
    fullTopicArn = "arn:sns",
    monitoringTopicArn = "arn:sns")

  // ------------------------------------------------------ SQS goldens

  test("snapshot sender message matches the reference golden (SQSMessagingServiceTest.kt)") {
    val sqs = new RecordingSqs
    new SqsMessagingService(sqsCfg, sqs, sleeper = noSleep)
      .notifySnapshotSender("db.collection")
    val expected =
      """{
        |   "shutdown_flag": "true",
        |   "correlation_id": "correlation-id",
        |   "topic_name": "db.database.collection",
        |   "export_date": "2020-06-05",
        |   "reprocess_files": "false",
        |   "s3_full_folder": "db.collection",
        |   "snapshot_type": "incremental"
        |}""".stripMargin
    assert(sqs.sent.toList == List(SqsMessage(
      "http://aws:4566/000000000000/snapshot-sender-queue", expected,
      Some("db_database_collection"))))
  }

  test("no-files-exported message matches the reference golden") {
    val sqs = new RecordingSqs
    new SqsMessagingService(sqsCfg, sqs, sleeper = noSleep)
      .notifySnapshotSenderNoFilesExported()
    val expected =
      """{
        |   "shutdown_flag": "true",
        |   "correlation_id": "correlation-id",
        |   "topic_name": "db.database.collection",
        |   "export_date": "2020-06-05",
        |   "reprocess_files": "false",
        |   "snapshot_type": "incremental",
        |   "files_exported": 0
        |}""".stripMargin
    assert(sqs.sent.toList == List(SqsMessage(
      "http://aws:4566/000000000000/snapshot-sender-queue", expected,
      Some("db_database_collection"))))
  }

  test("data egress message matches the reference golden (plain queue, no group id)") {
    val sqs = new RecordingSqs
    new SqsMessagingService(sqsCfg, sqs, sleeper = noSleep)
      .sendDataEgressMessage("test/prefix/pipeline_success.flag")
    val expected =
      """{
        |    "Records": [
        |        {
        |            "s3": {
        |                "object": {
        |                    "key": "test/prefix/pipeline_success.flag"
        |                }
        |            }
        |        }
        |    ]
        |}""".stripMargin
    assert(sqs.sent.toList == List(SqsMessage(
      "http://aws:4566/000000000000/data-egress-queue", expected, None)))
  }

  test("snapshot sender messages are suppressed when the trigger flag is off") {
    val sqs = new RecordingSqs
    val svc = new SqsMessagingService(
      sqsCfg.copy(triggerSnapshotSender = false), sqs, sleeper = noSleep)
    svc.notifySnapshotSender("db.collection")
    svc.notifySnapshotSenderNoFilesExported()
    assert(sqs.sent.isEmpty)
  }

  test("SQS sends retry until successful (3 attempts like the reference case)") {
    var attempts = 0
    val flaky = new SqsClient {
      override def send(m: SqsMessage): Unit = {
        attempts += 1
        if (attempts < 3) throw new RuntimeException("sqs down")
      }
    }
    new SqsMessagingService(sqsCfg, flaky, Retry.Policy(maxAttempts = 10), noSleep)
      .notifySnapshotSender("db.collection")
    assert(attempts == 3)
  }

  test("SQS sends give up after maxAttempts") {
    var attempts = 0
    val dead = new SqsClient {
      override def send(m: SqsMessage): Unit = { attempts += 1; throw new RuntimeException("down") }
    }
    val svc = new SqsMessagingService(sqsCfg, dead, Retry.Policy(maxAttempts = 10), noSleep)
    intercept[RuntimeException](svc.notifySnapshotSender("db.collection"))
    assert(attempts == 10)
  }

  // ------------------------------------------------------ SNS goldens

  test("ADG trigger payload matches the reference golden (SnsServiceImplTest.kt)") {
    val sns = new RecordingSns
    new SnsPublishingService(snsCfg, sns, sleeper = noSleep)
      .sendExportCompletedSuccessfullyMessage()
    val expected = """{
                "overrides": {
                        "Name": "analytical-dataset-generator-full"
                },
                "additional_step_args": {
                        "submit-job": [
                          "--correlation_id", "correlation.id",
                          "--s3_prefix", "prefix",
                          "--snapshot_type", "full",
                          "--export_date", "2020-12-12"
                        ],
                        "courtesy-flush": [
                          "--correlation_id", "correlation.id",
                          "--s3_prefix", "prefix",
                          "--snapshot_type", "full",
                          "--export_date", "2020-12-12"
                        ],
                        "send_notification": [
                          "--correlation_id", "correlation.id",
                          "--s3_prefix", "prefix",
                          "--snapshot_type", "full",
                          "--export_date", "2020-12-12"
                        ]
                    }
                }"""
    assert(sns.published.toList == List(SnsMessage("arn:sns", expected)))
  }

  test("topic-failed monitoring payload matches the reference golden") {
    val sns = new RecordingSns
    new SnsPublishingService(snsCfg, sns, sleeper = noSleep)
      .sendTopicFailedMonitoringMessage()
    val expected = """{
                "severity": "High",
                "notification_type": "Warning",
                "slack_username": "HTME",
                "title_text": "Full - Collection failed",
                "custom_elements": [
                    {
                        "key": "Export date",
                        "value": "2020-12-12"
                    },
                    {
                        "key": "Correlation Id",
                        "value": "correlation.id"
                    },
                    {
                        "key": "Topic",
                        "value": "test_topic"
                    }
                ]
            }"""
    assert(sns.published.toList == List(SnsMessage("arn:sns", expected)))
  }

  test("completion monitoring payload: success is Critical/Information/success") {
    val sns = new RecordingSns
    new SnsPublishingService(snsCfg, sns, sleeper = noSleep)
      .sendCompletionMonitoringMessage(ExportCompletionStatus.CompletedSuccessfully)
    val expected = """{
                "severity": "Critical",
                "notification_type": "Information",
                "slack_username": "HTME",
                "title_text": "Full - Export finished - success",
                "custom_elements": [
                    {
                        "key": "Export date",
                        "value": "2020-12-12"
                    },
                    {
                        "key": "Correlation Id",
                        "value": "correlation.id"
                    }
                ]
            }"""
    assert(sns.published.toList == List(SnsMessage("arn:sns", expected)))
  }

  test("completion monitoring payload: failure is High/Warning/failed") {
    val sns = new RecordingSns
    new SnsPublishingService(snsCfg, sns, sleeper = noSleep)
      .sendCompletionMonitoringMessage(ExportCompletionStatus.CompletedUnsuccessfully)
    val payload = sns.published.head.payload
    assert(payload.contains("\"severity\": \"High\""))
    assert(payload.contains("\"notification_type\": \"Warning\""))
    assert(payload.contains("\"title_text\": \"Full - Export finished - failed\""))
  }

  test("ADG arn selection follows snapshot type; blank arn publishes nothing") {
    val sns = new RecordingSns
    new SnsPublishingService(
      snsCfg.copy(snapshotType = "incremental", incrementalTopicArn = "arn:inc"),
      sns, sleeper = noSleep).sendExportCompletedSuccessfullyMessage()
    assert(sns.published.head.topicArn == "arn:inc")
    assert(sns.published.head.payload.contains("analytical-dataset-generator-incremental"))

    val none = new RecordingSns
    new SnsPublishingService(snsCfg.copy(fullTopicArn = ""), none, sleeper = noSleep)
      .sendExportCompletedSuccessfullyMessage()
    assert(none.published.isEmpty)
  }

  test("SNS publishes retry until successful") {
    var attempts = 0
    val flaky = new SnsClient {
      override def publish(m: SnsMessage): Unit = {
        attempts += 1
        if (attempts < 3) throw new RuntimeException("sns down")
      }
    }
    new SnsPublishingService(snsCfg, flaky, Retry.Policy(maxAttempts = 10), noSleep)
      .sendTopicFailedMonitoringMessage()
    assert(attempts == 3)
  }

  // -------------------------------------------------- product status

  test("product status mirrors the DynamoDB update item semantics") {
    val svc = new InMemoryProductStatusService("correlation-id", sleeper = noSleep)
    assert(svc.currentStatus.isEmpty)
    svc.setCompletedStatus()
    assert(svc.currentStatus.contains("COMPLETED"))
    svc.setFailedStatus()
    assert(svc.currentStatus.contains("FAILED"))
  }

  // ------------------------------------------------- listener flows

  private def harness(cfg: Config) = {
    val status = new InMemoryStatusService
    val product = new InMemoryProductStatusService(cfg.correlationId, sleeper = noSleep)
    val sqs = new RecordingSqs
    val sns = new RecordingSns
    val listener = new CompletionListener(cfg, status, product,
      new SqsMessagingService(cfg, sqs, sleeper = noSleep),
      new SnsPublishingService(cfg, sns, sleeper = noSleep))
    (listener, status, product, sqs, sns)
  }

  test("success with zero files: no-files message + COMPLETED product + success monitoring") {
    val (listener, status, product, sqs, sns) = harness(snsCfg)
    val result = listener.afterJob(JobOutcome(completed = true))
    assert(result == ExportCompletionStatus.CompletedSuccessfully)
    assert(status.statuses() == Seq("Exported"))
    assert(sqs.sent.map(_.body).exists(_.contains("\"files_exported\": 0")))
    assert(product.currentStatus.contains("COMPLETED"))
    assert(sns.published.map(_.payload).exists(_.contains("Export finished - success")))
  }

  test("failure: failed status + topic-failed monitoring + FAILED product + failed monitoring") {
    val (listener, status, product, sqs, sns) = harness(snsCfg)
    val result = listener.afterJob(JobOutcome(completed = false))
    assert(result == ExportCompletionStatus.CompletedUnsuccessfully)
    assert(status.statuses() == Seq("Export_Failed"))
    assert(sqs.sent.isEmpty)
    assert(product.currentStatus.contains("FAILED"))
    assert(sns.published.map(_.payload).exists(_.contains("Collection failed")))
    assert(sns.published.map(_.payload).exists(_.contains("Export finished - failed")))
  }

  test("blocked topic COUNTS AS SUCCESS for the run-level fold (reference quirk)") {
    val (listener, status, product, _, sns) = harness(snsCfg)
    val result = listener.afterJob(JobOutcome(completed = false, blockedTopic = true))
    assert(result == ExportCompletionStatus.CompletedSuccessfully)
    assert(status.statuses() == Seq("Blocked_Topic"))
    assert(product.currentStatus.contains("COMPLETED"))
    assert(sns.published.map(_.payload).exists(_.contains("Collection failed")))
  }

  test("RIS egress fires on success with exported files, with the prefixed key") {
    val cfg = snsCfg.copy(sendToRis = true, s3Prefix = "exports",
      topicName = "db.database.collection")
    val (listener, status, _, sqs, _) = harness(cfg)
    status.incrementExportedCount("db.database.collection")
    listener.afterJob(JobOutcome(completed = true))
    assert(sqs.sent.map(_.body).exists(
      _.contains("\"key\": \"exports/db.database.collection-\"")))
  }

  test("PDM common-model egress fires only for incremental with a prefix, on terminal status") {
    val cfg = snsCfg.copy(snapshotType = "incremental",
      pdmCommonModelSitePrefix = "pdm/prefix/pipeline_success.flag",
      incrementalTopicArn = "arn:inc")
    val (listener, _, _, sqs, _) = harness(cfg)
    listener.afterJob(JobOutcome(completed = true))
    assert(sqs.sent.map(_.body).exists(
      _.contains("\"key\": \"pdm/prefix/pipeline_success.flag\"")))

    val (fullListener, _, _, fullSqs, _) = harness(
      snsCfg.copy(pdmCommonModelSitePrefix = "pdm/prefix"))
    fullListener.afterJob(JobOutcome(completed = true))
    assert(!fullSqs.sent.map(_.body).exists(_.contains("pdm/prefix")))
  }

  test("ADG trigger fires only on triggerAdg + completed-successfully") {
    val (adg, _, _, _, adgSns) = harness(snsCfg.copy(triggerAdg = true))
    adg.afterJob(JobOutcome(completed = true))
    assert(adgSns.published.map(_.payload).exists(
      _.contains("analytical-dataset-generator-full")))

    val (noAdg, _, _, _, noAdgSns) = harness(snsCfg)
    noAdg.afterJob(JobOutcome(completed = true))
    assert(!noAdgSns.published.map(_.payload).exists(
      _.contains("analytical-dataset-generator")))
  }
}
