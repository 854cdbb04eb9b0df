package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One input event for stateful sessionization. */
case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Per-user open-session state. */
case class SessionState(start: Long, lastSeen: Long, nEvents: Long)

/** One emitted (closed or expired) session. */
case class SessionOut(user_id: Long, start_ts: Long, end_ts: Long,
    n_events: Long, closed_by: String)

/** Custom streaming state via `flatMapGroupsWithState` — gap-based session
  * windows maintained per user key, the stateful analog of the batch
  * q22_sessionize query: a session closes when a gap over `gapMs` arrives
  * (emitting the previous session) or when the processing-time timeout
  * fires with no further events.
  */
object StatefulSessionize {

  /** `timeout` defaults to ProcessingTimeTimeout so idle sessions flush in
    * production; pass NoTimeout in deterministic tests — a pending
    * processing-time timeout keeps the engine triggering batches, so
    * `processAllAvailable` never settles. */
  def sessions(events: Dataset[SessionEvent], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout) {
        (userId: Long, batch: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.lastSeen, s.nEvents, "timeout"))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen > gapMs =>
                  closed += SessionOut(userId, s.start, s.lastSeen, s.nEvents, "gap")
                  cur = Some(SessionState(t, t, 1))
                case Some(s) =>
                  cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    nEvents = s.nEvents + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
