package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.operators._

/** The user-facing store API — a drop-in functional replacement for the
  * reference's driver facade (`driver/driver.ts`): open-or-create
  * (`createAstroDB`, driver.ts:28-48), add / remove / removeMultiple /
  * updateVector / sync (driver.ts:115-282), threshold-scaled search
  * (driver.ts:290-307), point lookup (driver.ts:309-312), compaction
  * (`rebuildGraphNodes`, astrovault.ts:87-132), and store deletion
  * (astrovault.ts:134-146).
  *
  * State is a versioned parquet snapshot chain with an atomic CURRENT
  * pointer (same layout as [[graft.streaming.StreamingIngest]]) — readers
  * always see a complete snapshot, and persistence cost is O(table), once
  * per batch, instead of the reference's O(index) per mutation. All
  * mutations are batch-first: the single-record overloads wrap one-row
  * DataFrames around the batch operators.
  */
class VectorStore private (
    val spark: SparkSession,
    val path: String,
    val params: IndexParams) {
  import graft.streaming.StreamingIngest.{currentVersion, loadState}

  /** Current table snapshot (id, vector, deleted). */
  def nodes: DataFrame =
    loadState(spark, path).getOrElse(VectorStore.emptyTable(spark))

  def count(): Long = nodes.filter(!col("deleted")).count()

  private def persist(next: DataFrame): Unit = {
    val v = currentVersion(spark, path).getOrElse(-1L) + 1
    next.write.mode("overwrite").parquet(s"$path/v$v")
    graft.util.Fs.writeStringAtomic(spark, s"$path/CURRENT", v.toString)
  }

  /** Validation: non-null ids (driver.ts:124-129 rejects empty ids) and
    * exact dimension match (hnsw.ts:155-160 throws on mismatch). */
  private def validate(batch: DataFrame, idC: String = "id",
      vecC: String = "vector"): DataFrame = {
    // NULL-safe: size(NULL) is NULL, so a plain =!= predicate would let
    // null-vector rows through silently
    val bad = batch.filter(col(idC).isNull || col(vecC).isNull ||
      size(col(vecC)) =!= params.dim).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"invalid row (null id/vector or dimension != ${params.dim}): ${bad.head}")
    batch
  }

  /** Batch upsert (covers add + update, hnsw.ts:154-173/497-517).
    * A DataFrame carries no arrival order: duplicate ids within one batch
    * resolve deterministically (content-hash tie-break) — callers that
    * need FIFO order across duplicates must provide a `batch_seq` column
    * (higher wins), as the streaming ingest path does. */
  def addBatch(batch: DataFrame): Unit =
    persist(Mutations.upsert(nodes,
      validate(batch).withColumn("deleted", lit(false))))

  def add(id: Long, vector: Seq[Float]): Unit = {
    import spark.implicits._
    addBatch(Seq((id, vector)).toDF("id", "vector"))
  }

  def updateVector(id: Long, vector: Seq[Float]): Unit = add(id, vector)

  /** Tombstone one/many ids (driver.ts:157-192). */
  def removeMultiple(ids: Seq[Long]): Unit = {
    import spark.implicits._
    persist(Mutations.tombstone(nodes, ids.toDF("id")))
  }
  def remove(id: Long): Unit = removeMultiple(Seq(id))

  /** Differential sync (driver.ts:245-282 / worker.ts:3-44): apply only
    * new-or-changed incoming rows; returns how many were applied. */
  def sync(incoming: DataFrame): Long = {
    val delta = Mutations.syncDiff(nodes, incoming).persist()
    try {
      val n = delta.count() // also materializes the cache for the upsert
      if (n > 0)
        persist(Mutations.upsert(nodes, delta.withColumn("deleted", lit(false))))
      n
    } finally { delta.unpersist(); () }
  }

  /** Threshold-scaled batch search (driver.ts:290-307): strengthSetting on
    * the 0–100 scale, /100 capped at 0.95. */
  def search(queries: DataFrame, k: Int, strengthSetting: Double = 50): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    // reference throws on dimension mismatch (hnsw.ts:155-160); the kernel
    // would otherwise silently truncate to min(len) and score garbage
    validate(queries, "query_id", "query_vec")
    KnnSearch.knnExact(nodes, queries, k,
      KnnSearch.scaleThreshold(strengthSetting), params.metric)
  }

  /** One-vector convenience search returning (id, score) rows. */
  def search(vector: Seq[Float], k: Int, strengthSetting: Double): DataFrame = {
    import spark.implicits._
    search(Seq((0L, vector)).toDF("query_id", "query_vec"), k, strengthSetting)
      .select(col("id"), col("score"))
  }

  /** Point lookup — returns tombstoned rows too (driver.ts:309-312). */
  def getNode(id: Long): Option[(Long, Seq[Float], Boolean)] = {
    import spark.implicits._
    KnnSearch.pointLookup(nodes, lit(id))
      .as[(Long, Seq[Float], Boolean)].collect().headOption
  }

  /** Index generations: each (re)build/merge writes a fresh
    * `index_g{N}` directory, then atomically flips the `INDEX` pointer
    * file (write-temp + rename-overwrite) — readers resolve the pointer
    * and always see a complete generation; there is never a moment with
    * no live index during a swap. */
  private def currentIndexGen: Option[Long] =
    if (graft.util.Fs.exists(spark, s"$path/INDEX"))
      Some(graft.util.Fs.readString(spark, s"$path/INDEX").trim.toLong)
    else None
  private def indexDir(gen: Long): String = s"$path/index_g$gen"
  private def flipIndexPointer(newGen: Long, oldGen: Option[Long]): Unit = {
    graft.util.Fs.writeStringAtomic(spark, s"$path/INDEX", newGen.toString)
    // old generation is unreferenced now; best-effort cleanup (a crash
    // here leaks a directory, never correctness)
    oldGen.foreach(g => graft.util.Fs.deleteRecursive(spark, indexDir(g)))
  }

  /** Compaction (astrovault.ts:87-132): physically drop tombstones, then
    * rebuild + save the ANN index from the compacted table. */
  def rebuild(): Unit = {
    graft.functions.VectorFunctions.register(spark)
    val compacted = Mutations.compact(nodes)
    persist(compacted)
    val (n, e) = IndexBuild.build(compacted, params)
    val old = currentIndexGen
    val gen = old.getOrElse(-1L) + 1
    IndexBuild.save(n, e, params, indexDir(gen))
    flipIndexPointer(gen, old)
  }

  /** Incremental index maintenance ([[IndexBuild.merge]]): apply `delta`
    * (id, vector[, deleted]) to the table snapshot AND fold it into the
    * saved ANN index without a full rebuild — O(|Δ|) instead of O(table)
    * per ingest batch.
    *
    * Failure ordering: the merged generation is fully written BEFORE the
    * table snapshot advances, and the pointer flips last — a crash at any
    * step leaves the store retryable (re-running mergeIndex with the same
    * delta merges against the still-current generation; the table upsert
    * is idempotent) and never serves a partial index. */
  def mergeIndex(delta: DataFrame): Unit = {
    graft.functions.VectorFunctions.register(spark)
    val old = currentIndexGen.getOrElse(throw new IllegalStateException(
      s"no ANN index under $path — call rebuild() first"))
    val d = validate(delta)
    val dd = if (d.columns.contains("deleted")) d
             else d.withColumn("deleted", lit(false))
    val (n0, e0, p) = IndexBuild.load(spark, indexDir(old))
    val (n1, e1) = IndexBuild.merge(n0, e0, dd, p)
    IndexBuild.save(n1, e1, p, indexDir(old + 1))
    persist(Mutations.upsert(nodes, dd))
    flipIndexPointer(old + 1, Some(old))
  }

  /** ANN search against the last rebuilt/merged index (LSH path). */
  def searchAnn(queries: DataFrame, k: Int, strengthSetting: Double = 50): DataFrame = {
    graft.functions.VectorFunctions.register(spark)
    val gen = currentIndexGen.getOrElse(throw new IllegalStateException(
      s"no ANN index under $path — call rebuild() first"))
    val (n, _, p) = IndexBuild.load(spark, indexDir(gen))
    AnnSearch.searchLsh(n, queries, k,
      KnnSearch.scaleThreshold(strengthSetting), p)
  }

  /** Drop the store (astrovault.ts:134-146). */
  def delete(): Unit = graft.util.Fs.deleteRecursive(spark, path)
}

object VectorStore {
  private[graft] def emptyTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Seq[Float], Boolean)].toDF("id", "vector", "deleted")
  }

  /** Open an existing store or create an empty one — `getAstroDB`
    * (driver.ts:40-48). */
  def openOrCreate(spark: SparkSession, path: String,
      params: IndexParams = IndexParams()): VectorStore = {
    graft.util.Fs.mkdirs(spark, path)
    new VectorStore(spark, path, params)
  }
}
