package graft.pipeline

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Driver-side control plane behind traits with local impls — the
  * Spark-first form of the reference's export-status + completion
  * fan-out (these are post-action driver hooks, not query operators):
  *
  *  - blocked-topic gate (app/utils/FilterBlockedTopicsUtils.kt:14-25),
  *    a precondition evaluated before building the DataFrame;
  *  - per-collection export status + file-count accounting
  *    (app/services/impl/DynamoDBExportStatusService.kt:30-58);
  *  - the run-level completion fold over every collection's status
  *    (DynamoDBExportStatusService.kt:150-166: all-successful /
  *    any-in-progress / any-failed / else-not-completed — note
  *    Table_Unavailable and Blocked_Topic COUNT AS SUCCESS);
  *  - the afterJob decision table
  *    (app/batch/JobCompletionNotificationListener.kt:47-141):
  *    terminal status from the failure kind, the "no files exported"
  *    special message, and the completion fan-out events.
  */
object Control {

  // ------------------------------------------------------ blocked gate

  final case class BlockedTopicException(topic: String)
    extends RuntimeException(s"Provided topic is blocked so cannot be processed: '$topic'")

  /** The reference's TableNotFoundException/TableNotEnabledException
    * class (JobCompletionNotificationListener.kt:143-145): a missing
    * or disabled source table terminates the job with the
    * Table_Unavailable status — which COUNTS AS SUCCESS in the
    * run-level fold. */
  final case class TableUnavailableException(table: String)
    extends RuntimeException(s"Table unavailable: '$table'")

  /** Comma-separated blocklist; exact-match gate. Throws
    * BlockedTopicException like the reference (the driver maps it to
    * the Blocked_Topic terminal status). */
  def checkTopicNotBlocked(topic: String, blockedTopics: String): Unit = {
    val blocked =
      if (blockedTopics.contains(',')) blockedTopics.split(",").toSeq
      else Seq(blockedTopics)
    if (blocked.contains(topic)) throw BlockedTopicException(topic)
  }

  // ------------------------------------------------------ status model

  sealed trait CollectionStatus { def name: String }
  object CollectionStatus {
    case object Exporting extends CollectionStatus { val name = "Exporting" }
    case object Exported extends CollectionStatus { val name = "Exported" }
    case object Sent extends CollectionStatus { val name = "Sent" }
    case object Received extends CollectionStatus { val name = "Received" }
    case object Success extends CollectionStatus { val name = "Success" }
    case object TableUnavailable extends CollectionStatus { val name = "Table_Unavailable" }
    case object BlockedTopic extends CollectionStatus { val name = "Blocked_Topic" }
    case object ExportFailed extends CollectionStatus { val name = "Export_Failed" }

    /** DynamoDBExportStatusService.kt:158-166 status classes. */
    val successful: Set[String] = Set("Exported", "Sent", "Received",
      "Success", "Table_Unavailable", "Blocked_Topic")
    val unsuccessful: Set[String] = Set("Export_Failed")
    val inProgress: Set[String] = Set("Exporting")
  }

  sealed trait ExportCompletionStatus
  object ExportCompletionStatus {
    case object CompletedSuccessfully extends ExportCompletionStatus
    case object CompletedUnsuccessfully extends ExportCompletionStatus
    case object InProgress extends ExportCompletionStatus
    case object NotCompleted extends ExportCompletionStatus
  }

  /** Run-level fold over all collections' statuses
    * (DynamoDBExportStatusService.kt:150-157) — ORDER MATTERS:
    * all-successful first, then any-in-progress, then any-failed. */
  def exportCompletionStatus(statuses: Seq[String]): ExportCompletionStatus = {
    import CollectionStatus._
    import ExportCompletionStatus._
    if (statuses.nonEmpty && statuses.forall(successful.contains)) CompletedSuccessfully
    else if (statuses.exists(inProgress.contains)) InProgress
    else if (statuses.exists(unsuccessful.contains)) CompletedUnsuccessfully
    else NotCompleted
  }

  // --------------------------------------------------- status service

  /** One collection's status-item read-back — the ALL_NEW attribute
    * view the reference logs on every status write
    * (DynamoDBExportStatusService.kt:112-117: CollectionStatus,
    * FilesExported, FilesSent). */
  final case class StatusItem(status: Option[String], filesExported: Int,
      filesSent: Int)

  /** Per-collection status + file-count accounting (the DynamoDB
    * table's contract, keyed (correlationId, collection)).
    * `FilesExported` is written by the exporter; `FilesSent` is the
    * SENDER-FEEDBACK counter — the downstream snapshot-sender
    * increments it as it forwards each file, the exporter only reads
    * it back (DynamoDBExportStatusService.kt:117), so
    * exported-vs-sent drift is the run's shipping lag. */
  trait ExportStatusService {
    def setStatus(collection: String, status: CollectionStatus): Unit
    def incrementExportedCount(collection: String): Unit
    def exportedFilesCount(collection: String): Int
    /** Sender-side feedback write (the snapshot-sender's role). */
    def incrementSentCount(collection: String): Unit
    def sentFilesCount(collection: String): Int
    def statusItem(collection: String): StatusItem
    def statuses(): Seq[String]
  }

  /** In-memory impl for tests/local runs. */
  final class InMemoryStatusService extends ExportStatusService {
    private val status = new ConcurrentHashMap[String, String]()
    private val counts = new ConcurrentHashMap[String, AtomicInteger]()
    private val sent = new ConcurrentHashMap[String, AtomicInteger]()
    override def setStatus(collection: String, s: CollectionStatus): Unit =
      status.put(collection, s.name)
    override def incrementExportedCount(collection: String): Unit =
      counts.computeIfAbsent(collection, _ => new AtomicInteger).incrementAndGet()
    override def exportedFilesCount(collection: String): Int =
      Option(counts.get(collection)).map(_.get).getOrElse(0)
    override def incrementSentCount(collection: String): Unit =
      sent.computeIfAbsent(collection, _ => new AtomicInteger).incrementAndGet()
    override def sentFilesCount(collection: String): Int =
      Option(sent.get(collection)).map(_.get).getOrElse(0)
    override def statusItem(collection: String): StatusItem =
      StatusItem(Option(status.get(collection)),
        exportedFilesCount(collection), sentFilesCount(collection))
    override def statuses(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      status.values.asScala.toSeq
    }
  }

  // --------------------------------------------- afterJob decision

  /** What a finished job observed (the JobExecution surface the
    * listener reads). */
  final case class JobOutcome(
      completed: Boolean,
      tableUnavailable: Boolean = false,
      blockedTopic: Boolean = false)

  /** Events the completion fan-out can emit
    * (JobCompletionNotificationListener.kt:47-141 condensed: each case
    * object is one external side effect the reference performs). */
  sealed trait CompletionEvent
  object CompletionEvent {
    case object SnapshotSenderNoFiles extends CompletionEvent
    case object TopicFailedMonitoring extends CompletionEvent
    case object AdgTrigger extends CompletionEvent
    case object DataEgressRis extends CompletionEvent
    case object PdmCommonModel extends CompletionEvent
    case object CompletionMonitoring extends CompletionEvent
  }

  /** Terminal per-collection status from the job outcome
    * (JobCompletionNotificationListener.kt:69-91). */
  def terminalStatus(outcome: JobOutcome): CollectionStatus = {
    import CollectionStatus._
    if (outcome.completed) Exported
    else if (outcome.tableUnavailable) TableUnavailable
    else if (outcome.blockedTopic) BlockedTopic
    else ExportFailed
  }

  /** The fan-out decision table
    * (JobCompletionNotificationListener.kt:93-141): which events fire
    * for a given outcome + run-level completion status + flags. */
  def completionEvents(
      outcome: JobOutcome,
      completionStatus: ExportCompletionStatus,
      exportedFiles: Int,
      triggerAdg: Boolean = false,
      sendToRis: Boolean = false,
      pdmPrefixSet: Boolean = false,
      snapshotType: String = "full"): Set[CompletionEvent] = {
    import CompletionEvent._
    import ExportCompletionStatus._
    val terminal = completionStatus == CompletedSuccessfully ||
      completionStatus == CompletedUnsuccessfully
    Set.newBuilder[CompletionEvent]
      .++=(if (outcome.completed && exportedFiles == 0)
        Seq(SnapshotSenderNoFiles) else Nil)
      .++=(if (!outcome.completed) Seq(TopicFailedMonitoring) else Nil)
      .++=(if (completionStatus == CompletedSuccessfully && triggerAdg)
        Seq(AdgTrigger) else Nil)
      .++=(if (outcome.completed && sendToRis && exportedFiles > 0)
        Seq(DataEgressRis) else Nil)
      .++=(if (pdmPrefixSet && snapshotType == "incremental" && terminal)
        Seq(PdmCommonModel) else Nil)
      .++=(if (terminal) Seq(CompletionMonitoring) else Nil)
      .result()
  }
}
