package graft.operators

import org.apache.spark.sql.DataFrame
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
    * pick. Output: (query_id, rank, id, sim_micro, mmr_micro). */
  def mmrTopK(
      nodes: DataFrame,
      queries: DataFrame,
      k: Int,
      shortlist: Int,
      lambdaMicro: Long = 700000L,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    require(k > 0 && shortlist >= k, s"need shortlist >= k > 0, got k=$k shortlist=$shortlist")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1e6], got $lambdaMicro")
    val short = KnnSearch.knnExact(nodes, queries, shortlist,
      minSim = -2.0, metric, idCol, vecCol,
      broadcastBytes = broadcastBytes)
    // re-attach vectors for the pairwise redundancy term (knnExact
    // returns ranks only): id-keyed equi-join against the node table
    // with the Q·s-row shortlist as the broadcast-gated small side, so
    // the corpus side never shuffles for the re-attach
    val withVec = KnnSearch.maybeBroadcast(short, broadcastBytes).join(
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
}
