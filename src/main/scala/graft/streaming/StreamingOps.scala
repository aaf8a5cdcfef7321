package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming + typed-aggregation operators beyond the stateless export
  * pipeline (the reference is strictly batch; these are the north-star
  * Structured Streaming surface: watermarks, event-time windows, custom
  * keyed state, and the typed Aggregator form of a UDAF).
  */
object StreamingOps {

  // ---------------------------------------------- event-time windows

  /** Windowed event counts with a watermark: late events beyond the
    * watermark are dropped, per-window aggregates finalize once the
    * watermark passes. Works identically on batch DataFrames (Spark
    * runs the same plan without state). */
  def windowedEventCounts(events: DataFrame, eventTimeCol: String,
      watermarkDelay: String, windowLength: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("event_type"), col("n"))

  // -------------------------------------------------- custom state

  final case class UserEvent(user_id: Long, event_id: Long, ts: Timestamp)
  final case class UserSessionState(maxEventId: Long, eventsInSession: Long)
  final case class SessionUpdate(user_id: Long, events: Long, max_event_id: Long)

  /** Session tracking with mapGroupsWithState: per-user state
    * accumulates (max event id, session size) across micro-batches —
    * the KeyValueGroupedDataset custom-state form the north star calls
    * for. (An idle-timeout close would add
    * GroupStateTimeout.ProcessingTimeTimeout + state.remove on
    * hasTimedOut; kept timeout-free here for deterministic tests.) */
  def sessionize(events: Dataset[UserEvent]): Dataset[SessionUpdate] = {
    implicit val stateEnc = Encoders.product[UserSessionState]
    implicit val outEnc = Encoders.product[SessionUpdate]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent],
            state: GroupState[UserSessionState]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(UserSessionState(-1L, 0L))
          val next = UserSessionState(
            math.max(prev.maxEventId, batch.map(_.event_id).max),
            prev.eventsInSession + batch.size)
          state.update(next)
          SessionUpdate(userId, next.eventsInSession, next.maxEventId)
      }
  }

  // ---------------------------------------- streaming band registry

  final case class BandObs(band_key: Long, doc_id: Long)
  final case class BandVerdict(doc_id: Long, earlier: Boolean)

  /** Streaming LSH band registry — the stateful core of online
    * near-dedup: per band key, state is the minimum doc id ever seen;
    * each observation reports whether an EARLIER doc (a previous
    * micro-batch, or a smaller id in this one) already claimed the
    * band. Feeding every band of a doc's simhash/minhash signature
    * through this and OR-ing the verdicts yields exactly the batch
    * "kill any doc with a smaller-id band collision" rule, but
    * incrementally: a new micro-batch compares only against 8 bytes of
    * state per distinct band key, never against the corpus.
    *
    * Scale: state size = |distinct band keys| × 8 bytes, bounded by
    * corpus band cardinality regardless of stream length; at 100 TB
    * add a state TTL (GroupStateTimeout) if the dedup horizon is
    * bounded in event time. Within-batch order is pinned to ascending
    * doc_id so replay determinism never depends on partition
    * interleaving. */
  def bandRegistry(obs: Dataset[BandObs]): Dataset[BandVerdict] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val outEnc = Encoders.product[BandVerdict]
    obs.groupByKey(_.band_key)
      .flatMapGroupsWithState[Long, BandVerdict](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BandObs], state: GroupState[Long]) =>
          var mn = state.getOption.getOrElse(Long.MaxValue)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            val v = BandVerdict(r.doc_id, mn < r.doc_id)
            mn = math.min(mn, r.doc_id)
            v
          }
          state.update(mn)
          out.iterator
      }
  }

  // ------------------------------------------------ typed Aggregator

  /** Bounded top-k by value: a typed `Aggregator[IN, BUF, OUT]` (the
    * UDAF surface) keeping at most k (value, id) pairs per group —
    * constant-size partial aggregates, so the merge tree never grows
    * with group cardinality (the scale-safe alternative to
    * collect_list + sort). */
  final case class ScoredId(id: Long, value: Double)

  final class TopKAggregator(k: Int)
      extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
    override def zero: List[ScoredId] = Nil
    private def trim(xs: List[ScoredId]): List[ScoredId] =
      xs.sortBy(x => (-x.value, x.id)).take(k)
    override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] =
      trim(a :: buf)
    override def merge(b1: List[ScoredId], b2: List[ScoredId]): List[ScoredId] =
      trim(b1 ++ b2)
    override def finish(reduction: List[ScoredId]): Seq[ScoredId] =
      reduction.sortBy(x => (-x.value, x.id))
    override def bufferEncoder: org.apache.spark.sql.Encoder[List[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
