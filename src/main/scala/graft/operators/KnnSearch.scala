package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Batch kNN search over a vector table — the Spark-native generalization of
  * the reference's one-query-at-a-time `searchKNNOptimized`
  * (`hnsw.ts:241-299`) + driver threshold handling
  * (`driver/driver.ts:290-307`): many query vectors at once, exact scoring.
  *
  * Scale design: the queries side is expected to be small relative to the
  * node table, so it is broadcast — the similarity join is then a map-side
  * pass over the (arbitrarily large, partition-parallel) node table with no
  * node-side shuffle. The only shuffle is the per-query top-K rank on the
  * score-thresholded candidate set, which Spark ≥3.5 executes with a
  * WindowGroupLimit (running top-K heap) pushed below the exchange, so the
  * shuffled volume is O(queries × K), not O(queries × nodes).
  */
object KnnSearch {

  /** Reference driver threshold semantics (`driver/driver.ts:296-298`):
    * user-facing strength setting is a 0–100 scale, /100, capped at 0.95. */
  def scaleThreshold(strengthSetting: Double): Double =
    math.min(strengthSetting / 100.0, 0.95)

  /** THE broadcast gate, defined once: hint `df` for broadcast only while
    * its Catalyst size estimate fits `bytes` (the cheap, no-job estimate
    * Spark's own join planning reads); past that return it unhinted so
    * AQE picks the strategy and a query-proportional table is never
    * pinned in every executor. Every operator with a query-/delta-sized
    * side table ([[AnnSearch]], [[PqIndex]], [[Retrieval]],
    * [[TextDedup.contamination]]) routes through this helper — one place
    * to fix if the gate rule ever changes. */
  def maybeBroadcast(df: DataFrame, bytes: Long): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= bytes)
      broadcast(df)
    else df

  /** THE filtered-search restriction, defined once: semi-join an
    * id-keyed index table (`assignments`, `codes`, `bits`, node rows)
    * against the caller's filtered id set (a one-column `id` relation)
    * BEFORE probing/scoring — PRE-filter semantics, so a selective
    * predicate SHRINKS index-arm work in proportion to the filtered
    * fraction, and results are exact top-k OVER THE FILTERED SUBSET
    * (a post-filter of an unfiltered top-k can return < k rows or miss
    * matches entirely; this never does). No-op without a filter. The
    * reference's tombstone result-filter (`hnsw.ts:292`) is the
    * degenerate predicate `deleted = false`. */
  def restrictIds(df: DataFrame, idFilter: Option[DataFrame],
      idCol: String = "id"): DataFrame =
    idFilter.map(f =>
      df.join(f.select(col("id").as(idCol)), Seq(idCol), "left_semi"))
      .getOrElse(df)

  /** Exact top-K per query vector with a similarity floor.
    *
    * The query side broadcasts only while its Catalyst size estimate fits
    * `broadcastBytes` (the cheap, no-job gate Spark itself uses for join
    * planning). Beyond that — a query set too big to pin in every
    * executor's memory — the score pass becomes a shuffle-replicated
    * nested-loop: both sides stay partitioned, each task scores one
    * (node-partition × query-partition) block, and the per-query top-K
    * still collapses map-side via WindowGroupLimit before the one rank
    * shuffle. Same results, no driver/executor broadcast ceiling.
    *
    * @param nodes   vector table with columns (`idCol`, `vecCol`) and
    *                optionally `deleted` (tombstones excluded, `hnsw.ts:292`)
    * @param queries query table with columns (`queryIdCol`, `queryVecCol`)
    * @param k       max results per query (`hnsw.ts:294-296`)
    * @param minSim  similarity floor, already on the 0–1 scale
    * @param broadcastBytes query-side size ceiling for the broadcast plan
    * @return columns: query_id, id, score, rn (rank, 1-based)
    */
  def knnExact(
      nodes: DataFrame,
      queries: DataFrame,
      k: Int,
      minSim: Double,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val scored = scoreAll(nodes, queries, minSim, metric, idCol, vecCol,
      queryIdCol, queryVecCol, broadcastBytes)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(queryIdCol), col(idCol), col("score"), col("rn"))
  }

  /** The exact scoring pass [[knnExact]] ranks over, exposed for
    * operators that need a different per-query limit structure (e.g.
    * [[Diversify.groupedTopK]]'s group-quota windows): every
    * (query, live node) pair scored, threshold- and NaN-filtered, with
    * the query side broadcast-gated exactly as in [[knnExact]]. Carries
    * ALL node columns (group keys survive for downstream windows). */
  private[graft] def scoreAll(
      nodes: DataFrame,
      queries: DataFrame,
      minSim: Double,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      broadcastBytes: Long = 64L << 20,
      queriesSmallHint: Option[Boolean] = None): DataFrame = {
    val scoreFn: (Column, Column) => Column = metric match {
      case "cosine" => VectorFunctions.cosineSim
      case "euclidean" => VectorFunctions.euclideanSim
      case other => throw new IllegalArgumentException(
        s"unknown metric $other") // hnsw.ts:39-49 throws likewise
    }
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    // the stats gate is a cheap CATALYST ESTIMATE: accurate for scans
    // and local relations, but a DERIVED query side (aggregate over a
    // join, as in Recommend) reports the conservative default size and
    // silently lands on the replicated-NL path at ~2× the wall
    // (DiversifyProbe measured 469 s vs 253 s exact at 1 M) — callers
    // that KNOW the derived cardinality pass the verdict explicitly
    val queriesSmall = queriesSmallHint.getOrElse(
      queries.queryExecution.optimizedPlan.stats.sizeInBytes <= broadcastBytes)
    val joined =
      if (queriesSmall) live.join(broadcast(queries))
      else live.join(queries.hint("SHUFFLE_REPLICATE_NL"))
    joined
      // barrier (r16): without it the filter below pushes into the join
      // condition by alias substitution and the kernel evaluates up to
      // 3× per candidate pair (see [[graft.functions.BarrierExpr]]) —
      // this is the hot loop of every exact-scoring consumer
      .withColumn("score",
        VectorFunctions.once(scoreFn(col(queryVecCol), col(vecCol))))
      // NaN guard: a zero-norm vector scores NaN; the reference's JS
      // `score > strength` is FALSE for NaN (dropped), but Spark orders
      // NaN above every double, so it would pass the filter AND take
      // rank 1 — exclude it explicitly to keep reference semantics
      .filter(col("score") > lit(minSim) && !isnan(col("score")))
  }

  /** Keyset pagination over the exact search order — `search_after`
    * semantics: page N+1 is the top-`k` of the candidates STRICTLY
    * AFTER the caller's cursor in the (score desc, id asc) total
    * order, computed statelessly (no server-side scroll context — the
    * cursor is the last row of the previous page, so deep paging costs
    * one scoring pass per page and never materializes earlier pages).
    * The reference's search is single-page only (`hnsw.ts:294-296`);
    * this is the serving-surface extension every result-list UI needs.
    *
    * `cursors` columns: (query_id, after_score, after_id) — one row
    * per query; queries WITHOUT a cursor row get page 1 (the knnExact
    * result). Strictly-after filter: score < after_score OR
    * (score = after_score AND id > after_id) — exact because scores
    * are deterministic doubles (the v01 kernel rule), so the float
    * equality compare is engine-portable and a tie page splits
    * identically everywhere.
    *
    * Scale: one [[scoreAll]] pass (broadcast-gated queries), the
    * cursor attach is a query-count-sized broadcast join, and the
    * page rank is the same map-side WindowGroupLimit as [[knnExact]] —
    * shuffled volume O(queries × k) per page.
    *
    * Output: (query_id, id, score, rn) — rn is the rank WITHIN the
    * page (1-based). */
  def searchAfter(
      nodes: DataFrame,
      queries: DataFrame,
      cursors: DataFrame,
      k: Int,
      minSim: Double,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20,
      cursorRowsHint: Long = -1L): DataFrame = {
    val scored = scoreAll(nodes, queries, minSim, metric, idCol, vecCol,
      broadcastBytes = broadcastBytes)
    pageAfter(scored, cursors, k, idCol, broadcastBytes, cursorRowsHint)
  }

  /** [[searchAfter]]'s cursor filter + page rank over an ALREADY-SCORED
    * relation — the piece a scored-relation cache (or any serving arm's
    * shortlist) pages over without paying the scoring pass again:
    * `scored` needs (query_id, `idCol`, score); extra columns (a cached
    * rank) are dropped and the page rank recomputed. Cursor and
    * strictly-after semantics exactly as documented on [[searchAfter]].
    * Queries present in `scored` but cursor-less get page 1. */
  /** `cursorRowsHint` ≥ 0 asserts the caller-known cursor cardinality
    * (one row per paging query — ≤ Q by the one-cursor window below),
    * arming the broadcast when `hint × 32 B` fits `broadcastBytes`: a
    * DERIVED cursor relation (page 1's rank-k rows, an arm's shortlist
    * tail) carries product-propagated Catalyst estimates that defeat
    * the stats gate (the r14 `queriesSmallHint` bug class), so without
    * the hint every page re-planned the cursor attach as a sort-merge
    * join that shuffled the scored relation. −1 keeps the stats gate. */
  def pageAfter(
      scored: DataFrame,
      cursors: DataFrame,
      k: Int,
      idCol: String = "id",
      broadcastBytes: Long = 64L << 20,
      cursorRowsHint: Long = -1L): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    // one cursor per query: a multi-row cursor relation would FAN OUT
    // every scored candidate through the join — keep the most-advanced
    // cursor (deepest page: lowest score, then highest id) so retried /
    // duplicated cursor writes degrade to "furthest page wins"
    // deterministically instead of duplicating rows
    val curW = Window.partitionBy(col("query_id"))
      .orderBy(col("after_score").asc, col("after_id").desc)
    val cur = cursors.select(col("query_id"), col("after_score"),
        col("after_id"))
      .withColumn("_cn", row_number().over(curW))
      .filter(col("_cn") === 1)
      .drop("_cn")
    val curSide =
      if (cursorRowsHint >= 0 && cursorRowsHint * 32L <= broadcastBytes)
        broadcast(cur)
      else maybeBroadcast(cur, broadcastBytes)
    val after = scored
      .select(col("query_id"), col(idCol), col("score"))
      .join(curSide, Seq("query_id"), "left")
      .filter(col("after_score").isNull ||
        col("score") < col("after_score") ||
        (col("score") === col("after_score") &&
          col(idCol) > col("after_id")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    after
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col(idCol).as("id"), col("score"), col("rn"))
  }

  /** Point lookup by primary key — returns tombstoned rows too, matching
    * `getSingleAstroDBNode` (`driver/driver.ts:309-312`). */
  def pointLookup(nodes: DataFrame, key: Column, idCol: String = "id"): DataFrame =
    nodes.filter(col(idCol) === key)
}
