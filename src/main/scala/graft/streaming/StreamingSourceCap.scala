package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One incoming document for streaming per-source admission. */
case class CapIn(doc_id: Long, source: String, day: String)

/** Admission decision: running per-(source, day) rank and whether the
  * document made it under the cap. */
case class CapOut(doc_id: Long, source: String, day: String,
    src_rank: Long, admitted: Boolean)

/** Streaming per-source daily quota via `transformWithState` with
  * MAP-typed state — the streaming face of the batch
  * [[graft.operators.CorpusOps]] `sourceCap` (C4/RefinedWeb-style
  * anti-dominance caps applied at INGEST time, before a dominant crawl
  * domain ever lands in the corpus).
  *
  * Why MapState (vs one ValueState blob): the key is the SOURCE, but the
  * quota resets per day — a map `day → admitted-count` lets each day's
  * counter update without re-encoding every other day's, old days can be
  * evicted per-entry ([[MapState.removeKey]]), and the RocksDB backend
  * stores each (source, day) pair as its own row, so a source with a
  * year of history never materializes one giant blob on the heap. This
  * is the state-variable granularity the v2 API exists for —
  * [[StreamingDedup]] covers ValueState+TTL, [[StatefulSessionizeV2]]
  * covers timers, this covers MapState.
  *
  * State is BOUNDED by explicit per-entry eviction, not TTL (TTL is a
  * processing-time clock; day keys live on DATA time): after each batch,
  * day keys older than the newest `retainDays` distinct days seen for
  * the source are removed, so a long-lived source holds ≤ retainDays +
  * batch-new-days entries. Day strings must sort chronologically (ISO
  * `yyyy-MM-dd`), and `retainDays` must cover the pipeline's late-data
  * horizon — a row for an evicted day re-opens that day's counter at 0.
  *
  * Determinism: batches are unordered, so rows are ranked (day, doc_id)
  * within each micro-batch before counting — the same salted-rank idea
  * as the batch operator reduced to arrival order across batches plus a
  * deterministic order within one.
  */
object StreamingSourceCap {

  class CapProcessor(maxPerSourcePerDay: Long, retainDays: Int = 7)
      extends StatefulProcessor[String, CapIn, CapOut] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("day_counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CapIn],
        timerValues: TimerValues): Iterator[CapOut] = {
      val sorted = rows.toArray.sortBy(r => (r.day, r.doc_id))
      val out = Array.newBuilder[CapOut]
      sorted.foreach { r =>
        val seen =
          if (counts.containsKey(r.day)) counts.getValue(r.day) else 0L
        val rank = seen + 1L
        counts.updateValue(r.day, rank)
        out += CapOut(r.doc_id, key, r.day, rank,
          admitted = rank <= maxPerSourcePerDay)
      }
      // bound the map: evict day entries older than the newest
      // `retainDays` distinct days this source has ever counted (ISO day
      // strings sort chronologically). Iterating keys here is O(entries),
      // which eviction itself keeps ≤ retainDays + new-days-this-batch.
      val days = counts.keys().toArray.sorted
      if (days.length > retainDays)
        days.dropRight(retainDays).foreach(counts.removeKey)
      out.result().iterator
    }
  }

  /** Admission stream keyed by source. Requires the RocksDB state store
    * provider (state v2). Downstream keeps `admitted` rows; the rejected
    * ones flow too so a pipeline can count what the cap dropped.
    * `retainDays` bounds per-source state (see the eviction note above). */
  def cap(in: Dataset[CapIn], maxPerSourcePerDay: Long,
      retainDays: Int = 7)(
      implicit spark: SparkSession): Dataset[CapOut] = {
    import spark.implicits._
    in.groupByKey(_.source)
      .transformWithState(new CapProcessor(maxPerSourcePerDay, retainDays),
        TimeMode.None(), OutputMode.Append())
  }
}
