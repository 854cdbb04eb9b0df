package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One incoming token/key occurrence for streaming frequency tracking. */
case class HhIn(source: String, item: String)

/** Current candidate set after a batch: the item's Misra–Gries count
  * (a LOWER bound on its true count — undercount ≤ n/(k+1)), and the
  * source's total occurrences so far, so a consumer can threshold on
  * `mg_count / n_total` knowing the guarantee direction. */
case class HhOut(source: String, item: String, mg_count: Long,
    n_total: Long)

/** Streaming per-source heavy hitters via `transformWithState` with
  * MAP-typed state — the streaming face of the batch
  * [[graft.functions.Sketches.heavyHitters]] (the two-pass exact scheme;
  * a stream can't recount, so this face keeps the classic one-pass
  * Misra–Gries contract instead): per source, a bounded map of ≤ k
  * counters; every item with true share > 1/(k+1) of the source's
  * stream is GUARANTEED present (no false negatives above the design
  * share), counts are lower bounds, false positives are possible and
  * cheap to filter downstream (or batch-recount — the t31 pass-2 —
  * over the tiny candidate set).
  *
  * Why MapState: one RocksDB row per (source, item) counter — the
  * decrement-all step rewrites ≤ k entries, hot items update without
  * re-encoding the rest, and state is bounded at k entries per source
  * BY THE ALGORITHM (the sketch's defining property), not by TTL or
  * eviction policy. Emits the source's full candidate set each batch it
  * receives rows, DECLARED as OutputMode.Update — the honest label for
  * re-emitting rows keyed by (source, item): latest wins, and an
  * update-aware sink replaces instead of accumulating. (The previous
  * Append declaration forced every consumer to implement the
  * latest-per-key dedup itself or silently double-count.) */
object StreamingHeavyHitters {

  class HhProcessor(k: Int)
      extends StatefulProcessor[String, HhIn, HhOut] {
    @transient private var counters: MapState[String, Long] = _
    @transient private var total: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("mg_counters",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      // single-entry map ("n" → total): keeps both variables in the same
      // state-v2 idiom; a ValueState would do equally
      total = getHandle.getMapState[String, Long]("totals",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[HhIn],
        timerValues: TimerValues): Iterator[HhOut] = {
      var n = if (total.containsKey("n")) total.getValue("n") else 0L
      var size = counters.keys().size // once per batch; maintained below
      rows.foreach { r =>
        n += 1L
        if (counters.containsKey(r.item))
          counters.updateValue(r.item, counters.getValue(r.item) + 1L)
        else if (size < k) {
          counters.updateValue(r.item, 1L)
          size += 1
        } else {
          // decrement-all; evict zeros (the MG step — ≤ k entries)
          counters.keys().toArray.foreach { item =>
            val c = counters.getValue(item) - 1L
            if (c == 0L) { counters.removeKey(item); size -= 1 }
            else counters.updateValue(item, c)
          }
        }
      }
      total.updateValue("n", n)
      counters.keys().toArray.sorted.iterator.map(item =>
        HhOut(key, item, counters.getValue(item), n))
    }
  }

  /** Candidate stream keyed by source; `k` counters per source bound
    * both state and the no-false-negative share at 1/(k+1). Requires
    * the RocksDB state store provider (state v2).
    *
    * CONTRACT: rows are UPDATES keyed by (source, item) — the operator
    * re-emits a source's current candidate set every batch that touches
    * it, declared OutputMode.Update. Write the query with
    * `outputMode("update")`; a consumer that must read an append log
    * anyway takes the latest row per (source, item) (max `n_total`).
    *
    * MIGRATION (r10): this operator was declared `OutputMode.Append`
    * through round 9 — a mis-declaration (re-emitted candidate rows are
    * updates, not appends). Compiled consumer queries still starting
    * with `outputMode("append")` now FAIL AT QUERY START with an
    * analysis error rather than degrading: switch them to
    * `outputMode("update")`. The emitted rows themselves are
    * unchanged. */
  def track(in: Dataset[HhIn], k: Int)(
      implicit spark: SparkSession): Dataset[HhOut] = {
    require(k >= 1, s"k $k")
    import spark.implicits._
    in.groupByKey(_.source)
      .transformWithState(new HhProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }
}
