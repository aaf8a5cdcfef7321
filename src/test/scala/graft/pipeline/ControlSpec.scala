package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import Control._

/** Control-plane spec mirroring FilterBlockedTopicsUtilsTest, the
  * DynamoDBExportStatusService completion fold (:150-166) and the
  * JobCompletionNotificationListenerTest decision table (389 lines). */
class ControlSpec extends AnyFunSuite {

  test("blocked-topic gate: exact match on the comma list (FilterBlockedTopicsUtils.kt:14-25)") {
    checkTopicNotBlocked("db.ok.topic", "db.bad.one,db.bad.two")
    intercept[BlockedTopicException](
      checkTopicNotBlocked("db.bad.one", "db.bad.one,db.bad.two"))
    intercept[BlockedTopicException](
      checkTopicNotBlocked("db.only", "db.only")) // single, no comma
    checkTopicNotBlocked("db.bad", "db.bad.one,db.bad.two") // no substring match
    checkTopicNotBlocked("anything", "NOT_SET")
  }

  test("completion fold: all-successful wins, incl. unavailable/blocked (DynamoDBExportStatusService.kt:150-166)") {
    import ExportCompletionStatus._
    assert(exportCompletionStatus(Seq("Exported", "Sent", "Received")) == CompletedSuccessfully)
    // Table_Unavailable and Blocked_Topic count as SUCCESS
    assert(exportCompletionStatus(Seq("Exported", "Table_Unavailable", "Blocked_Topic")) == CompletedSuccessfully)
    assert(exportCompletionStatus(Seq("Exported", "Exporting")) == InProgress)
    // in-progress outranks failed
    assert(exportCompletionStatus(Seq("Export_Failed", "Exporting")) == InProgress)
    assert(exportCompletionStatus(Seq("Exported", "Export_Failed")) == CompletedUnsuccessfully)
    assert(exportCompletionStatus(Seq("SomethingElse")) == NotCompleted)
  }

  test("terminal status from job outcome (JobCompletionNotificationListener.kt:69-91)") {
    import CollectionStatus._
    assert(terminalStatus(JobOutcome(completed = true)) == Exported)
    assert(terminalStatus(JobOutcome(completed = false, tableUnavailable = true)) == TableUnavailable)
    assert(terminalStatus(JobOutcome(completed = false, blockedTopic = true)) == BlockedTopic)
    assert(terminalStatus(JobOutcome(completed = false)) == ExportFailed)
    // tableUnavailable outranks blockedTopic (checked first)
    assert(terminalStatus(JobOutcome(completed = false,
      tableUnavailable = true, blockedTopic = true)) == TableUnavailable)
  }

  test("fan-out decision table (JobCompletionNotificationListener.kt:93-141)") {
    import CompletionEvent._
    import ExportCompletionStatus._
    val ok = JobOutcome(completed = true)
    val failed = JobOutcome(completed = false)

    // empty export → the special no-files message
    assert(completionEvents(ok, InProgress, exportedFiles = 0)
      == Set(SnapshotSenderNoFiles))
    // successful completion + flags → adg, ris, monitoring
    assert(completionEvents(ok, CompletedSuccessfully, exportedFiles = 3,
      triggerAdg = true, sendToRis = true)
      == Set(AdgTrigger, DataEgressRis, CompletionMonitoring))
    // adg only on COMPLETED_SUCCESSFULLY
    assert(!completionEvents(ok, CompletedUnsuccessfully, 3, triggerAdg = true)
      .contains(AdgTrigger))
    // failure → topic-failed monitoring, no ris
    assert(completionEvents(failed, CompletedUnsuccessfully, 0, sendToRis = true)
      == Set(TopicFailedMonitoring, CompletionMonitoring))
    // pdm only for incremental snapshots at a terminal status
    assert(completionEvents(ok, CompletedSuccessfully, 1,
      pdmPrefixSet = true, snapshotType = "incremental")
      .contains(CompletionEvent.PdmCommonModel))
    assert(!completionEvents(ok, CompletedSuccessfully, 1,
      pdmPrefixSet = true, snapshotType = "full")
      .contains(CompletionEvent.PdmCommonModel))
    assert(!completionEvents(ok, InProgress, 1,
      pdmPrefixSet = true, snapshotType = "incremental")
      .contains(CompletionEvent.PdmCommonModel))
  }

  test("in-memory status service: counts + statuses") {
    val svc = new InMemoryStatusService
    svc.setStatus("collA", CollectionStatus.Exporting)
    svc.setStatus("collB", CollectionStatus.Exported)
    svc.incrementExportedCount("collB")
    svc.incrementExportedCount("collB")
    assert(svc.exportedFilesCount("collB") == 2)
    assert(svc.exportedFilesCount("collA") == 0)
    assert(svc.statuses().sorted == Seq("Exported", "Exporting"))
    svc.setStatus("collA", CollectionStatus.Exported)
    assert(Control.exportCompletionStatus(svc.statuses())
      == ExportCompletionStatus.CompletedSuccessfully)
  }

  test("exported-vs-sent accounting: FilesSent is sender feedback, read back with the status item") {
    val svc = new InMemoryStatusService
    svc.setStatus("collA", CollectionStatus.Exported)
    // exporter writes FilesExported; the downstream sender writes
    // FilesSent as it forwards — mid-run the counts legitimately drift
    (1 to 3).foreach(_ => svc.incrementExportedCount("collA"))
    (1 to 2).foreach(_ => svc.incrementSentCount("collA"))
    assert(svc.exportedFilesCount("collA") == 3)
    assert(svc.sentFilesCount("collA") == 2)
    val item = svc.statusItem("collA")
    assert(item == Control.StatusItem(Some("Exported"), 3, 2))
    // the sender catches up; an untouched collection reads zeros
    svc.incrementSentCount("collA")
    assert(svc.statusItem("collA").filesSent == 3)
    assert(svc.statusItem("collB") == Control.StatusItem(None, 0, 0))
  }
}
