package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Mutations

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
  */
object StreamingIngest {

  /** Current state pointer (versioned snapshot directory), or None before
    * the first batch. */
  def currentVersion(statePath: String): Option[Long] = {
    val f = new java.io.File(s"$statePath/CURRENT")
    if (f.exists())
      Some(new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong)
    else None
  }

  def loadState(spark: SparkSession, statePath: String): Option[DataFrame] =
    currentVersion(statePath).map(v =>
      spark.read.parquet(s"$statePath/v$v"))

  /** Apply one mutation batch to the state (pure transform, also used by the
    * batch path): upserts latest-wins by seq, then tombstones. */
  def applyBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val ups = batch.filter(col("op") === "upsert")
      .select(col("id"), col("vector"), lit(false).as("deleted"),
        col("seq").as("batch_seq"))
    val dels = batch.filter(col("op") === "delete").select(col("id"))
    val upserted = Mutations.upsert(state, ups)
    Mutations.tombstone(upserted, dels)
  }

  /** Start the single-writer ingest query. Each micro-batch reads the
    * current snapshot, applies the batch, writes snapshot v{batchId}, and
    * atomically flips the CURRENT pointer — so readers always see a complete
    * snapshot (the Spark analog of IndexedDB's transactional put). */
  def start(spark: SparkSession, events: DataFrame, statePath: String,
      emptyState: DataFrame): StreamingQuery = {
    new java.io.File(statePath).mkdirs()
    events.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark2 = batch.sparkSession
        val state = loadState(spark2, statePath).getOrElse(emptyState)
        applyBatch(state, batch)
          .write.mode("overwrite").parquet(s"$statePath/v$batchId")
        val tmp = java.nio.file.Paths.get(s"$statePath/CURRENT.tmp")
        java.nio.file.Files.writeString(tmp, batchId.toString)
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(s"$statePath/CURRENT"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      }
      .start()
  }
}
