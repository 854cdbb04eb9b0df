package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch mutation operators over the vector table — the Spark analogs of the
  * reference's single-writer mutation API (`driver/driver.ts`). Each is a
  * pure DataFrame transform: current state in, next state out; persistence is
  * the caller's parquet write (replacing the reference's full-JSON-snapshot-
  * per-mutation, `astrovault.ts:34-40`).
  *
  * Scale design: all operators are equi-joins / window-dedups on the id key —
  * they shuffle only on `id` and never collect to the driver. Delta inputs
  * are typically small vs the table: Spark's AQE will broadcast them; the
  * big side streams.
  */
object Mutations {

  /** Latest-wins upsert: apply a batch of (id, vector) rows on top of the
    * current table. Matches `addPoint` overwrite semantics (`hnsw.ts:164-167`)
    * and `updatePoint` tombstone-then-reinsert (`hnsw.ts:497-517`) — the net
    * state is "newest vector for each id, not deleted".
    *
    * Both inputs must share the (id, vector, deleted) schema; `batch_seq`
    * orders multiple occurrences of one id (arrival order, the FIFO queue
    * semantics of `driver/driver.ts:51-80`): higher seq wins. The current
    * table is seq 0.
    */
  def upsert(current: DataFrame, delta: DataFrame, idCol: String = "id"): DataFrame = {
    val cur = current.withColumn("batch_seq", lit(0L))
    val d =
      if (delta.columns.contains("batch_seq")) delta
      else delta.withColumn("batch_seq", lit(1L))
    // Schema union: PAYLOAD columns may ride on either side — a store's
    // first batch DEFINES its payload columns (the documented
    // addBatch/searchWhere feature), and a later payload-less delta (a
    // streamed upsert) REPLACES its row with null payload (latest-wins
    // applies to the whole row). Rows from the side missing a column
    // null-fill it; nothing is silently projected away.
    val curA = d.schema.fields
      .filterNot(f => cur.columns.contains(f.name))
      .foldLeft(cur)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
    val dA = curA.schema.fields
      .filterNot(f => d.columns.contains(f.name))
      .foldLeft(d)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
    // secondary content-hash tie-break: several delta rows for one id with
    // equal batch_seq would otherwise pick a partitioning-dependent winner.
    // Hash the UNIONED schema (curA), not the pre-union one — two tied
    // delta rows may differ only in a delta-introduced payload column.
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("batch_seq").desc,
        xxhash64(struct(curA.columns.map(col).toIndexedSeq: _*)).desc)
    curA.unionByName(dA.select(curA.columns.map(col).toIndexedSeq: _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "batch_seq")
  }

  /** Logical delete (tombstone) of a set of ids — `removePoint`
    * (`hnsw.ts:212-226`) / bulk `removeMultipleFromAstroDB`
    * (`driver/driver.ts:172-192`). Rows stay in the table with
    * `deleted = true`; queries exclude them (`hnsw.ts:292`). */
  def tombstone(current: DataFrame, deleteIds: DataFrame, idCol: String = "id"): DataFrame = {
    // no forced broadcast: the delete set is caller input and can be huge
    // (bulk expiry); AQE broadcasts it when it's actually small
    val ids = deleteIds.select(col(idCol).as("__del_id")).distinct()
    current
      .join(ids, col(idCol) === col("__del_id"), "left_outer")
      .withColumn("deleted", col("deleted") || col("__del_id").isNotNull)
      .drop("__del_id")
  }

  /** Differential sync — `syncVectorsFromCloud` (`driver/worker.ts:3-44`):
    * given incoming (id, vector) rows, keep only the ones that are NEW or
    * CHANGED vs the current table (element-wise vector equality skip,
    * `driver/worker.ts:17-26`; empty-vector rows dropped,
    * `driver/worker.ts:10-13`). The output is the minimal delta to upsert.
    *
    * Vector equality compares the stored arrays directly (Spark array `<=>`),
    * not recomputed values — see SURVEY §7.5 on float round-trips.
    */
  def syncDiff(current: DataFrame, incoming: DataFrame,
      idCol: String = "id", vecCol: String = "vector"): DataFrame = {
    val cur = current.select(col(idCol).as("__cur_id"), col(vecCol).as("__cur_vec"))
    incoming
      .filter(size(col(vecCol)) > 0)
      .join(cur, col(idCol) === col("__cur_id"), "left_outer")
      .filter(col("__cur_id").isNull || !(col(vecCol) <=> col("__cur_vec")))
      .drop("__cur_id", "__cur_vec")
  }

  /** Compaction — `rebuildGraphNodes` (`astrovault.ts:87-132`): drop
    * tombstoned rows physically. Callers rebuild any derived index
    * (IndexBuild) from the compacted table, which also drops stale edges. */
  def compact(current: DataFrame): DataFrame =
    current.filter(!col("deleted"))
}
