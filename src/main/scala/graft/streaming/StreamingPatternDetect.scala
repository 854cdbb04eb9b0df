package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One incoming per-source ingest event (a fetch, a parse, a validation). */
case class EvIn(source: String, event_id: Long, failed: Boolean)

/** Per-event detection verdict: failures among the last `window` events
  * of the source (this event included) and whether that crossed the
  * alert threshold. */
case class EvOut(source: String, event_id: Long, fails_in_window: Long,
    alerted: Boolean)

/** Sliding-window failure-pattern detection via `transformWithState`
  * with LIST-typed state — "alert when ≥ N of a source's last K events
  * failed", the ingest-health tripwire a crawling pipeline runs per
  * domain (a source that starts serving errors/bot-walls should stop
  * admitting documents long before a daily quality report notices).
  *
  * Why ListState (vs one ValueState blob): the state is a bounded
  * RECENT-EVENTS buffer — arrivals append ([[ListState.appendValue]]),
  * expiry trims from the front, and the RocksDB backend stores each
  * element as its own row, so updating a K-deep buffer re-encodes one
  * element, not a K-sized blob. This is the last state-v2 variable shape
  * the suite showcases: [[StreamingDedup]] covers ValueState+TTL,
  * [[StreamingSourceCap]] MapState, [[StatefulSessionizeV2]] timers.
  *
  * Determinism: batches are unordered, so rows sort by event_id within
  * each micro-batch (the [[StreamingSourceCap]] rule); across batches
  * the buffer is arrival-ordered.
  */
object StreamingPatternDetect {

  /** Per-event outcome bit kept in the buffer. */
  case class BufEntry(event_id: Long, failed: Boolean)

  class PatternProcessor(window: Int, alertAt: Int)
      extends StatefulProcessor[String, EvIn, EvOut] {
    require(window > 0 && alertAt > 0 && alertAt <= window,
      s"need 0 < alertAt <= window; got window=$window alertAt=$alertAt")
    @transient private var recent: ListState[BufEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[BufEntry]("recent_events",
        Encoders.product[BufEntry], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[EvIn],
        timerValues: TimerValues): Iterator[EvOut] = {
      // the persisted tail is ≤ window entries by construction. The
      // batch's rows DO materialize once for the deterministic event_id
      // sort (the [[StreamingSourceCap]] trade-off — unordered batches
      // need an order before counting); the sliding buffer itself stays
      // ≤ window entries throughout.
      val buf = scala.collection.mutable.ArrayDeque.empty[BufEntry]
      recent.get().foreach(buf += _)
      var fails = buf.count(_.failed).toLong
      val out = Array.newBuilder[EvOut]
      rows.toArray.sortBy(_.event_id).foreach { r =>
        buf += BufEntry(r.event_id, r.failed)
        if (r.failed) fails += 1
        if (buf.length > window) {
          val dropped = buf.removeHead()
          if (dropped.failed) fails -= 1
        }
        out += EvOut(source = key, event_id = r.event_id,
          fails_in_window = fails, alerted = fails >= alertAt)
      }
      // one rewrite of the ≤ window-deep tail per (key, batch)
      recent.clear()
      recent.appendList(buf.toArray)
      out.result().iterator
    }
  }

  /** Detection stream keyed by source. Requires the RocksDB state store
    * provider (state v2). Every event flows through with its verdict —
    * downstream alerts on `alerted`, audits on `fails_in_window`. */
  def detect(in: Dataset[EvIn], window: Int, alertAt: Int)(
      implicit spark: SparkSession): Dataset[EvOut] = {
    import spark.implicits._
    in.groupByKey(_.source)
      .transformWithState(new PatternProcessor(window, alertAt),
        TimeMode.None(), OutputMode.Append())
  }
}
