package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based session windows on `transformWithState` (Spark 4 arbitrary
  * state v2) — the v2 face of [[StatefulSessionize]], covering what the v1
  * `flatMapGroupsWithState` API cannot express:
  *
  *  - EXPLICIT TIMERS: one event-time timer per key marks the open
  *    session's gap deadline; expiry arrives in its own callback
  *    ([[StatefulSessionizeV2.SessionProcessor.handleExpiredTimer]]) with
  *    the exact firing timestamp, replacing v1's single `hasTimedOut`
  *    boolean + hand-rolled `setTimeoutDuration` bookkeeping. Idle
  *    sessions therefore close off the WATERMARK clock — deterministic
  *    and replayable — instead of wall-clock processing time.
  *  - typed, independently-evolvable state variables (one open-session
  *    value here; a processor can add list/map state without re-encoding
  *    a single state blob).
  *  - the RocksDB state store backend (state spills to local disk —
  *    required for state v2, and the scale answer for unbounded key
  *    spaces).
  *
  * Sessions close two ways, tagged in `closed_by`: a later event arrives
  * past the gap ("gap"), or the watermark passes lastSeen + gap with no
  * further event ("timer").
  */
object StatefulSessionizeV2 {

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionOut] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open_session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // events inside one micro-batch arrive unordered; the gap fold is
      // order-sensitive, so sort the batch (bounded by batch size, the
      // same cost v1 pays)
      val sorted = rows.toArray.sortBy(_.ts.getTime)
      var cur = if (open.exists()) Some(open.get()) else None
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastSeen > gapMs =>
            closed += SessionOut(key, s.start, s.lastSeen, s.nEvents, "gap")
            cur = Some(SessionState(t, t, 1))
          case Some(s) =>
            cur = Some(s.copy(lastSeen = math.max(s.lastSeen, t),
              nEvents = s.nEvents + 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // one live deadline per key: drop stale timers from earlier
        // batches, then arm the new gap deadline on the event-time clock
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.lastSeen + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // a fired timer can be stale (events in this batch extended the
      // session past the old deadline) — re-check against current state
      if (open.exists()) {
        val s = open.get()
        if (expiredTimerInfo.getExpiryTimeInMs() >= s.lastSeen + gapMs) {
          open.clear()
          Iterator(SessionOut(key, s.start, s.lastSeen, s.nEvents, "timer"))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** `delayThreshold` is the watermark delay on `ts` — how much event-time
    * disorder to tolerate before the timer clock advances. Requires the
    * RocksDB state store provider (state v2). */
  def sessions(events: Dataset[SessionEvent], gapMs: Long,
      delayThreshold: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", delayThreshold)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
