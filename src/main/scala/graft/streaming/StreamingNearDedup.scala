package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** One incoming embedding record, pre-exploded to one LSH band bucket. */
case class NearDupIn(doc_id: Long, bucket: String, vector: Array[Float])

/** Per-(doc, bucket) verdict: the lowest-id stored representative whose
  * cosine similarity exceeded the threshold, or −1 when none did (this
  * record became a representative itself, capacity permitting). */
case class NearDupOut(doc_id: Long, bucket: String, matched_rep: Long)

/** A stored bucket representative. */
case class RepEntry(doc_id: Long, vector: Array[Float])

/** Streaming EMBEDDING near-dup via `transformWithState` — the streaming
  * face of the batch semantic/LSH dedup family ([[graft.operators.TextDedup
  * .semanticDedup]], d06's anchored-LSH pairs) the way [[StreamingDedup]]
  * is the streaming face of exact dedup: incoming vectors key by their
  * sign-pattern LSH band buckets ([[graft.operators.AnnSearch
  * .anchorBucketKeys]] — the d06 family), each bucket keeps a bounded
  * list of representative vectors, and an arrival matching ANY stored
  * representative above `tau` is flagged with that representative's id.
  * A record that matches in no band registers as a representative in
  * each of its buckets (so later near-dups of it are caught); a record
  * that matches registers nowhere (its representative already covers its
  * neighborhood — the transitive SemDeDup keep-one rule).
  *
  * A record is a near-dup iff ANY of its band rows matched — consumers
  * fold the per-band verdicts per doc (`max(matched_rep) >= 0`), exactly
  * how the batch LSH path unions band candidates.
  *
  * Scale: state per bucket is ≤ `maxReps` vectors (a hot bucket CAPS
  * instead of growing — recall degrades gracefully, the LSH contract,
  * and the RocksDB backend spills what does accumulate to executor-local
  * disk); per-record work is nBands × ≤ maxReps sequential cosines; TTL
  * bounds representative lifetime under an unbounded id space. Nothing
  * is ever corpus-sized: the stream compares against representatives,
  * not against everything ever seen.
  *
  * Determinism: batch rows process in doc_id order per bucket (the
  * [[StreamingSourceCap]] rule — micro-batches are unordered), so
  * representative sets and match attributions replay identically.
  */
object StreamingNearDedup {

  /** Sequential-accumulation cosine on the driver/executor side (matches
    * the Catalyst kernel's summation order — same doubles). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  class NearDupProcessor(tau: Double, maxReps: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, NearDupIn, NearDupOut] {
    require(maxReps > 0, s"maxReps $maxReps")
    @transient private var reps: ListState[RepEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      reps = getHandle.getListState[RepEntry]("bucket_reps",
        Encoders.product[RepEntry], ttl)

    override def handleInputRows(key: String, rows: Iterator[NearDupIn],
        timerValues: TimerValues): Iterator[NearDupOut] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[RepEntry]
      reps.get().foreach(stored += _)
      var appended = false
      val out = Array.newBuilder[NearDupOut]
      rows.toArray.sortBy(_.doc_id).foreach { r =>
        var matched = -1L
        stored.foreach { e =>
          if ((matched < 0 || e.doc_id < matched) &&
            cosine(e.vector, r.vector) > tau) matched = e.doc_id
        }
        out += NearDupOut(r.doc_id, key, matched)
        if (matched < 0 && stored.length < maxReps) {
          stored += RepEntry(r.doc_id, r.vector)
          appended = true
        }
      }
      if (appended) {
        reps.clear()
        reps.appendList(stored.toArray)
      }
      out.result().iterator
    }
  }

  /** Explode (doc_id, vector) rows to one row per LSH band bucket. */
  def keyed(in: DataFrame, anchors: Seq[Seq[Array[Float]]])(
      implicit spark: SparkSession): Dataset[NearDupIn] = {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    in.select(col("doc_id"),
        explode(graft.operators.AnnSearch.anchorBucketKeys(
          col("vector"), anchors)).as("bucket"),
        col("vector"))
      .as[NearDupIn]
  }

  /** Near-dup detection stream. `in` is a streaming DataFrame with
    * (doc_id: Long, vector: Array[Float]); requires the RocksDB state
    * store provider (state v2). */
  def dedupNear(in: DataFrame, anchors: Seq[Seq[Array[Float]]],
      tau: Double, maxReps: Int = 64, ttl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[NearDupOut] = {
    import spark.implicits._
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    keyed(in, anchors).groupByKey(_.bucket)
      .transformWithState(new NearDupProcessor(tau, maxReps, ttl),
        timeMode, OutputMode.Append())
  }
}
