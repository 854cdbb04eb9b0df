package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Mutations
import graft.util.Fs

/** Streaming ingest into the vector table — the Structured Streaming
  * replacement for the reference's FIFO single-writer mutation queue
  * (`driver/driver.ts:24-80`): micro-batches ARE the serialized writer
  * (foreachBatch runs one batch at a time, in order), and versioned parquet
  * snapshots replace the full-JSON-per-mutation persistence
  * (`astrovault.ts:34-40`) with an atomically-switched pointer.
  *
  * Mutation event schema: (id LONG, vector ARRAY<FLOAT>, op STRING, seq LONG)
  * where op ∈ {upsert, delete} — upsert covers add + update
  * (`hnsw.ts:154-173`, `hnsw.ts:497-517`), delete is the tombstone
  * (`hnsw.ts:212-226`). `seq` orders events within a batch (arrival order);
  * batch order itself is the stream order.
  *
  * All pointer/sidecar I/O goes through the Hadoop FileSystem of the state
  * path, so the layout works on any cluster filesystem, not just the
  * driver's local disk.
  *
  * Single-writer contract: one running ingest query (or one batch
  * VectorStore writer) owns a state path at a time — batchIds and
  * VectorStore.persist share the version namespace, so concurrent writers
  * would race the pointer.
  */
object StreamingIngest {

  /** Current state pointer (versioned snapshot directory), or None before
    * the first batch. First token only: a [[graft.VectorStore]] streamed
    * node-delta chain writes the two-token `"N K"` form — the base
    * version is still token one. */
  def currentVersion(spark: SparkSession, statePath: String): Option[Long] = {
    val p = s"$statePath/CURRENT"
    if (Fs.exists(spark, p))
      Some(Fs.readString(spark, p).trim.split("\\s+")(0).toLong)
    else None
  }

  def loadState(spark: SparkSession, statePath: String): Option[DataFrame] =
    currentVersion(spark, statePath).map(v =>
      spark.read.parquet(s"$statePath/v$v"))

  /** Apply one mutation batch to the state (pure transform, also used by
    * the batch path), respecting `seq` arrival order per id:
    *  - the surviving vector is the LATEST upsert's vector;
    *  - the row is tombstoned iff a delete arrived AFTER that upsert;
    *  - delete-only ids tombstone whatever the prior state holds
    *    (a delete for an absent id is a no-op — `hnsw.ts:212-226`). */
  def applyBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("seq").desc)
    val lastUpsert = batch.filter(col("op") === "upsert")
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("id"), col("vector"), col("seq").as("up_seq"))
    val lastDelete = batch.filter(col("op") === "delete")
      .groupBy(col("id")).agg(max(col("seq")).as("del_seq"))
    val upserted = lastUpsert
      .join(lastDelete, Seq("id"), "left_outer")
      .select(col("id"), col("vector"),
        (col("del_seq").isNotNull && col("del_seq") > col("up_seq"))
          .as("deleted"),
        // normalized: exactly one upsert per id survives the window, and
        // prior state carries batch_seq 0 — raw event seqs of 0/negative
        // would tie or lose against state in Mutations.upsert
        lit(1L).as("batch_seq"))
    val deleteOnlyIds = lastDelete
      .join(lastUpsert, Seq("id"), "left_anti").select(col("id"))
    // the state may carry payload columns beyond (id, vector, deleted) —
    // the documented VectorStore.addBatch feature. Streamed events carry
    // none; Mutations.upsert's schema union null-fills them on the
    // upserted rows (a streamed upsert REPLACES its row, payload
    // included — the latest-wins rule; untouched ids keep theirs).
    Mutations.tombstone(Mutations.upsert(state, upserted), deleteOnlyIds)
  }

  /** Start the single-writer ingest query. Each micro-batch reads the
    * current snapshot, applies the batch, writes snapshot v{batchId}, and
    * atomically flips the CURRENT pointer — so readers always see a
    * complete snapshot (the Spark analog of IndexedDB's transactional put).
    *
    * Replay-safe: after a restart Structured Streaming may re-run the last
    * batch; if CURRENT already covers this batchId the batch is skipped —
    * re-applying would double-apply AND overwrite the very snapshot the
    * plan is reading from. */
  def start(spark: SparkSession, events: DataFrame, statePath: String,
      emptyState: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      retainVersions: Int = 3): StreamingQuery = {
    Fs.mkdirs(spark, statePath)
    events.writeStream
      .outputMode("append")
      // checkpoint makes batchIds monotonic across restarts — without it
      // they reset to 0 and the replay guard below would discard new
      // batches until the old CURRENT was exceeded (silent data loss)
      .option("checkpointLocation", s"$statePath/_checkpoint")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark2 = batch.sparkSession
        if (!batch.isEmpty &&
            !currentVersion(spark2, statePath).exists(_ >= batchId)) {
          val state = loadState(spark2, statePath).getOrElse(emptyState)
          applyBatch(state, batch)
            .write.mode("overwrite").parquet(s"$statePath/v$batchId")
          Fs.writeStringAtomic(spark2, s"$statePath/CURRENT", batchId.toString)
          // retention: superseded snapshots beyond the last N are dropped
          // AFTER the pointer flip (readers of older versions finish their
          // already-planned scans; new readers resolve CURRENT)
          (0L until batchId - retainVersions).foreach { v =>
            if (Fs.exists(spark2, s"$statePath/v$v"))
              Fs.deleteRecursive(spark2, s"$statePath/v$v")
          }
        }
        ()
      }
      .start()
  }
}
