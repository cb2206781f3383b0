package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event row (events table after nanos→micros ts conversion). */
case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

case class SessionizedEvent(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    session_seq: Int)

/** Per-user session counter carried across triggers. */
case class SessionProgress(sessionSeq: Int, lastTsMillis: Long)

/** Custom streaming state operator: gap-based sessionization via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset stateful path a
  * real-time pipeline uses (state = last seen timestamp + session
  * counter per user, carried across micro-batches). Works in batch too
  * (state starts empty per key), where it must agree with the
  * window-function formulation in [[Streaming.sessionize]]. */
object StatefulSessionize {

  def apply(events: Dataset[Event], gapMinutes: Int): Dataset[SessionizedEvent] = {
    val gapMillis = gapMinutes * 60L * 1000L
    implicit val outEnc = Encoders.product[SessionizedEvent]
    implicit val stateEnc = Encoders.product[SessionProgress]
    implicit val keyEnc = Encoders.scalaLong

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionProgress, SessionizedEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionProgress]) =>
          // Within one trigger, order by event time (bounded by trigger size;
          // a production variant bounds this with event-time watermarking).
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var progress = state.getOption.getOrElse(SessionProgress(0, Long.MinValue))
          val out = sorted.map { e =>
            val t = e.ts.getTime
            val newSession = progress.sessionSeq == 0 ||
              t - progress.lastTsMillis > gapMillis
            progress = SessionProgress(
              if (newSession) progress.sessionSeq + 1 else progress.sessionSeq, t)
            SessionizedEvent(e.event_id, e.ts, user, e.event_type, e.value,
              progress.sessionSeq)
          }
          state.update(progress)
          out.iterator
      }
  }
}
