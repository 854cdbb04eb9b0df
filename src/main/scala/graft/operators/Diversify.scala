package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diversified serving over the exact search tower: MMR
  * (maximal-marginal-relevance) top-k — return `k` results per query
  * that are RELEVANT to the query but not redundant with each other,
  * the standard re-rank a retrieval stack runs above raw similarity
  * order (RAG context assembly, dedup'd search results, exploratory
  * recommendation). The reference serves raw similarity order only
  * (`hnsw.ts:241-299`); this is additive engine surface in the same
  * family as the RRF/BM25 fusion in [[Retrieval]].
  *
  * Shape: two stages, both corpus-safe —
  *
  *  1. shortlist: [[KnnSearch.knnExact]] top-`shortlist` per query
  *     (broadcast-gated scoring pass over the node table; per-query
  *     WindowGroupLimit rank) — the ONLY stage that touches corpus
  *     rows, identical in cost to a plain exact search;
  *  2. greedy selection: the shortlist packs to one array row per
  *     query (an O(Q·s) grouped shuffle of narrow structs) and
  *     [[graft.functions.MmrSelectExpr]] runs the O(k·s·dim) greedy
  *     per QUERY row — eval-mode is fine off the corpus hot path (the
  *     expression's Scaladoc carries the argument).
  *
  * Any serving arm that yields (query_id, id, score) candidates can
  * replace stage 1 (IVF/PQ shortlists compose the same way); exact is
  * the reference-semantics default.
  *
  * Determinism: scores quantize to integer micros once
  * (floor(score·1e6 + 0.5) — the t09 rule); the greedy is exact BIGINT
  * arithmetic with id-ascending tie-breaks, so results are
  * partition-order-free and the v16 oracle re-derives the full greedy
  * (unrolled per rank) in SQL.
  */
object Diversify {

  /** MMR top-`k` per query. `lambdaMicro` is λ·1e6 — 1e6 = pure
    * relevance (plain kNN order), 0 = pure diversity after the first
    * pick. `minSim` floors the SHORTLIST (the [[KnnSearch.knnExact]]
    * threshold semantics — candidates below it can never be selected);
    * the default −2 admits everything, the diversity-first choice.
    * Output: (query_id, rank, id, sim_micro, mmr_micro). */
  def mmrTopK(
      nodes: DataFrame,
      queries: DataFrame,
      k: Int,
      shortlist: Int,
      lambdaMicro: Long = 700000L,
      metric: String = "cosine",
      minSim: Double = -2.0,
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    require(k > 0 && shortlist >= k, s"need shortlist >= k > 0, got k=$k shortlist=$shortlist")
    val short = KnnSearch.knnExact(nodes, queries, shortlist,
      minSim, metric, idCol, vecCol,
      broadcastBytes = broadcastBytes)
    mmrFromCandidates(short, nodes, k, lambdaMicro, metric, idCol, vecCol,
      broadcastBytes)
  }

  /** [[mmrTopK]] stage 2 over ANY serving arm's candidates — plug an
    * IVF/PQ/seeded shortlist (any (query_id, `idCol`, score) relation)
    * in place of the exact tower when the corpus is past the exact
    * cutoff: the greedy is identical, only shortlist RECALL differs
    * (the arm's usual contract). Candidates per query must be bounded
    * (they pack to one array row). Duplicate (query_id, id) rows are
    * tolerated: the kernel collapses duplicate-id slots to one
    * candidate (highest sim, order-free tie-break), so the greedy
    * never serves the same id at two ranks. */
  def mmrFromCandidates(
      candidates: DataFrame,
      nodes: DataFrame,
      k: Int,
      lambdaMicro: Long = 700000L,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1e6], got $lambdaMicro")
    // re-attach vectors for the pairwise redundancy term (serving arms
    // return ranks only): id-keyed equi-join against the node table
    // with the Q·s-row shortlist as the broadcast-gated small side, so
    // the corpus side never shuffles for the re-attach
    val withVec = KnnSearch.maybeBroadcast(
      candidates.select(col("query_id"), col(idCol).as("id"), col("score")),
      broadcastBytes).join(
      nodes.select(col(idCol).as("id"), col(vecCol).as("vector")),
      Seq("id"))
    val packed = withVec
      .select(col("query_id"),
        struct(
          col("id").cast("long").as("id"),
          floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long")
            .as("sim_micro"),
          col("vector")).as("c"))
      .groupBy(col("query_id"))
      .agg(collect_list(col("c")).as("cands"))
    packed
      .select(col("query_id"),
        explode(call_function("mmr_select", col("cands"),
          lit(k), lit(lambdaMicro), lit(metric))).as("r"))
      .select(col("query_id"), col("r.rank").as("rank"),
        col("r.id").as("id"), col("r.sim_micro").as("sim_micro"),
        col("r.mmr_micro").as("mmr_micro"))
  }

  /** Grouped kNN: per query, exact top-`k` under a PER-GROUP result
    * quota — at most `perGroup` hits from any one `groupCol` value
    * (dedup-by-document search results, per-source caps in RAG context
    * assembly: the metadata-diversity counterpart of [[mmrTopK]]'s
    * geometric diversity).
    *
    * Semantics: rank all candidates by (score desc, id), keep each
    * group's best `perGroup`, THEN take the per-query top-`k` of the
    * survivors — exact over the full corpus, not a shortlist post-
    * filter (a group-capped deep candidate can enter the top-k; a
    * shortlist would have dropped it). Both limits are `row_number`
    * windows, so Spark executes them as map-side WindowGroupLimit
    * heaps — the shuffled volume stays O(candidates-per-group-cap),
    * never O(Q·n) — and the scoring pass is [[KnnSearch.scoreAll]]
    * (broadcast-gated queries, tombstone + NaN + threshold semantics
    * identical to [[KnnSearch.knnExact]]).
    *
    * Output: (query_id, id, `groupCol`, gn, rn) — gn = rank within the
    * query's group (1..perGroup), rn = final rank (1..k).
    */
  def groupedTopK(
      nodes: DataFrame,
      queries: DataFrame,
      k: Int,
      perGroup: Int,
      groupCol: String,
      minSim: Double = -2.0,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    require(k > 0 && perGroup > 0,
      s"need k > 0 and perGroup > 0, got k=$k perGroup=$perGroup")
    val scored = KnnSearch.scoreAll(nodes, queries, minSim, metric,
      idCol, vecCol, broadcastBytes = broadcastBytes)
    val wg = Window.partitionBy(col("query_id"), col(groupCol))
      .orderBy(col("score").desc, col(idCol).asc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    scored
      .withColumn("gn", row_number().over(wg))
      .filter(col("gn") <= perGroup)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col(idCol).as("id"), col(groupCol),
        col("gn"), col("rn"))
  }

  /** [[groupedTopK]] stage 2 over ANY serving arm's candidates — the
    * [[mmrFromCandidates]] composition rule applied to the group quota
    * (what `VectorStore.searchGroupedAuto` serves past the exact
    * cutoff): group values re-attach to the (query_id, id, score)
    * shortlist by an id equi-join with the Q×s side broadcast-gated
    * (the corpus side never shuffles), then the same two rank windows.
    * SEMANTICS WEAKEN with the arm, deliberately: exact grouped search
    * can promote arbitrarily deep candidates when a hot group saturates
    * its quota, so the quota here is exact only over what the shortlist
    * recalled — size the shortlist for the expected hot-group
    * concentration. Output matches [[groupedTopK]]. */
  def groupedFromCandidates(
      candidates: DataFrame,
      nodes: DataFrame,
      k: Int,
      perGroup: Int,
      groupCol: String,
      idCol: String = "id",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    require(k > 0 && perGroup > 0,
      s"need k > 0 and perGroup > 0, got k=$k perGroup=$perGroup")
    val withG = KnnSearch.maybeBroadcast(
      candidates.select(col("query_id"), col(idCol).as("id"),
        col("score")), broadcastBytes)
      .join(nodes.select(col(idCol).as("id"), col(groupCol)), Seq("id"))
    val wg = Window.partitionBy(col("query_id"), col(groupCol))
      .orderBy(col("score").desc, col("id").asc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    withG
      .withColumn("gn", row_number().over(wg))
      .filter(col("gn") <= perGroup)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col(groupCol),
        col("gn"), col("rn"))
  }
}
