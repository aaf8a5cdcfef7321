package graft.pipeline

import graft.SparkSuite
import graft.pipeline.Completion._
import graft.pipeline.Control.{CollectionStatus, ExportCompletionStatus, InMemoryStatusService, JobOutcome}

/** Whole-job orchestration spec: gate → scan → pipeline → writer →
  * per-file accounting → completion fan-out, against the reference's
  * end-to-end expectations (UberTestSpec.kt "Correct messages sent":
  * one FIFO snapshot-sender message per written file carrying its
  * path, plus the no-files / blocked / failed flows). */
class ExportJobSpec extends SparkSuite {

  private val noSleep: Long => Unit = _ => ()

  private def harness(topic: String = Fixture.Topic) = {
    val outDir = java.nio.file.Files.createTempDirectory("graft-job-out")
    val manDir = java.nio.file.Files.createTempDirectory("graft-job-man")
    val cfg = Config(
      topicName = topic, snapshotType = "full", exportDate = "2020-06-05",
      correlationId = "job-correlation", s3Prefix = outDir.toString,
      monitoringTopicArn = "arn:mon", fullTopicArn = "arn:full")
    val writerCfg = SnapshotWriter.Config(outDir.toString, manDir.toString,
      topic, maxBatchBytes = 20000, compression = "gz")
    val status = new InMemoryStatusService
    val product = new InMemoryProductStatusService(cfg.correlationId, sleeper = noSleep)
    val sqs = new RecordingSqs
    val sns = new RecordingSns
    (cfg, writerCfg, status, product, sqs, sns,
      new SqsMessagingService(cfg, sqs, sleeper = noSleep),
      new SnsPublishingService(cfg, sns, sleeper = noSleep))
  }

  test("happy path: one snapshot-sender message per written file, counts + statuses land") {
    val (cfg, writerCfg, status, product, sqs, _, messaging, snsService) = harness()
    val result = ExportJob.run(spark, s => Fixture.generate(s, 500), cfg,
      writerCfg, Fixture.keyService, status, product, messaging, snsService)

    assert(result.outcome == JobOutcome(completed = true))
    assert(result.completionStatus == ExportCompletionStatus.CompletedSuccessfully)
    assert(result.files.nonEmpty && result.files.map(_.records).sum == 500)
    assert(result.skips == Map("ok" -> 500L))

    // one FIFO message per file, body carrying the object's full path
    val senderBodies = sqs.sent.filter(_.messageGroupId.isDefined).map(_.body)
    assert(senderBodies.size == result.files.size)
    result.files.foreach { fa =>
      assert(senderBodies.exists(_.contains(
        s""""s3_full_folder": "${writerCfg.outputDir}/${fa.file}"""")),
        s"missing per-file message for ${fa.file}")
    }
    assert(status.exportedFilesCount(cfg.topicName) == result.files.size)
    assert(status.statuses() == Seq(CollectionStatus.Exported.name))
    assert(product.currentStatus.contains("COMPLETED"))
  }

  test("empty source: zero files -> the no-files-exported message fires instead") {
    val (cfg, writerCfg, status, product, sqs, _, messaging, snsService) = harness()
    val result = ExportJob.run(spark, s => Fixture.generate(s, 0), cfg,
      writerCfg, Fixture.keyService, status, product, messaging, snsService)
    assert(result.files.isEmpty)
    assert(result.completionStatus == ExportCompletionStatus.CompletedSuccessfully)
    val bodies = sqs.sent.map(_.body)
    assert(bodies.size == 1 && bodies.head.contains("\"files_exported\": 0"))
  }

  test("blocked topic: Blocked_Topic status, counts as run-level success (quirk)") {
    val (cfg, writerCfg, status, product, sqs, sns, messaging, snsService) = harness()
    val result = ExportJob.run(spark,
      s => fail("source must not be read for a blocked topic"), cfg,
      writerCfg, Fixture.keyService, status, product, messaging, snsService,
      blockedTopics = s"other.topic,${cfg.topicName}")
    assert(result.outcome.blockedTopic)
    assert(status.statuses() == Seq(CollectionStatus.BlockedTopic.name))
    assert(result.completionStatus == ExportCompletionStatus.CompletedSuccessfully)
    assert(sqs.sent.isEmpty, "no snapshot-sender messages for a blocked topic")
    assert(sns.published.map(_.payload).exists(_.contains("Collection failed")))
    assert(product.currentStatus.contains("COMPLETED"))
  }

  test("unavailable table maps to Table_Unavailable (counts as success)") {
    val (cfg, writerCfg, status, product, _, _, messaging, snsService) = harness()
    val result = ExportJob.run(spark,
      _ => throw Control.TableUnavailableException("database:collection"), cfg,
      writerCfg, Fixture.keyService, status, product, messaging, snsService)
    assert(result.outcome.tableUnavailable)
    assert(status.statuses() == Seq(CollectionStatus.TableUnavailable.name))
    assert(result.completionStatus == ExportCompletionStatus.CompletedSuccessfully)
  }

  test("any other failure maps to Export_Failed + FAILED product status") {
    val (cfg, writerCfg, status, product, _, sns, messaging, snsService) = harness()
    val result = ExportJob.run(spark,
      _ => throw new RuntimeException("scan exploded"), cfg,
      writerCfg, Fixture.keyService, status, product, messaging, snsService)
    assert(result.outcome == JobOutcome(completed = false))
    assert(status.statuses() == Seq(CollectionStatus.ExportFailed.name))
    assert(result.completionStatus == ExportCompletionStatus.CompletedUnsuccessfully)
    assert(product.currentStatus.contains("FAILED"))
    assert(sns.published.map(_.payload).exists(_.contains("Export finished - failed")))
  }
}
