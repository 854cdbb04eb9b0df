package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** One incoming document-like record for streaming dedup. */
case class DedupIn(doc_id: Long, content_hash: String)

/** First occurrence of a key, with how many duplicates were dropped so far
  * emitted per batch re-encounter. */
case class DedupOut(doc_id: Long, content_hash: String, n_dropped: Long,
    first_seen: Boolean)

/** Streaming exact dedup via `transformWithState` (Spark 4 arbitrary state
  * v2) — the streaming face of the batch `TextDedup.exactDedup` operator:
  * the first record per key passes through, later arrivals (within the
  * state TTL) are counted and suppressed.
  *
  * State v2 over flatMapGroupsWithState buys, at scale: per-state TTL
  * (bounded state without hand-rolled timeout bookkeeping — essential when
  * the key space is unbounded document hashes), independently-typed state
  * variables, and the RocksDB state store backend (state spills to local
  * disk instead of executor heap).
  *
  * Requires `spark.sql.streaming.stateStore.providerClass` =
  * RocksDBStateStoreProvider (state v2 is not supported by the default
  * HDFS-backed store).
  */
object StreamingDedup {

  /** Keyed by content hash; `ttl` bounds how long a key suppresses
    * duplicates (TTLConfig.NONE = forever). */
  class DedupProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, DedupIn, DedupOut] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen_dropped",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[DedupIn],
        timerValues: TimerValues): Iterator[DedupOut] = {
      // one pass over the iterator, O(1) memory — a hot key's micro-batch
      // is never materialized on the heap (that would defeat the RocksDB
      // spill-to-disk argument for state v2)
      var n = 0L
      var minId = Long.MaxValue
      rows.foreach { r => n += 1; if (r.doc_id < minId) minId = r.doc_id }
      if (n == 0L) Iterator.empty
      else if (seen.exists()) {
        // key already emitted in an earlier batch: suppress all, bump count
        val dropped = seen.get() + n
        seen.update(dropped)
        Iterator(DedupOut(minId, key, dropped, first_seen = false))
      } else {
        // first encounter: emit the lowest-id representative, count the rest
        seen.update(n - 1L)
        Iterator(DedupOut(minId, key, n - 1L, first_seen = true))
      }
    }
  }

  def dedup(in: Dataset[DedupIn], ttl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[DedupOut] = {
    import spark.implicits._
    // a TTL needs a clock: Spark rejects any non-NONE TTLConfig under
    // TimeMode.None (StatefulProcessorCannotAssignTTLInTimeMode)
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    in.groupByKey(_.content_hash)
      .transformWithState(new DedupProcessor(ttl), timeMode,
        OutputMode.Append())
  }
}
