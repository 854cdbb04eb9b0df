package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{KnnSearch, Mutations}

/** Vector-table operator coverage (SURVEY §2 Table A): similarity kernels,
  * exact kNN with threshold + tombstones, point lookup, upsert / delete /
  * diff-sync / compaction flows, deterministic level assignment, and the
  * per-level kNN-graph neighbor selection that replaces HNSW insert wiring.
  *
  * The deterministic query set is every 50th `vec_id` (FIXTURES.md §Derived)
  * so the DuckDB oracle can re-derive it from the same parquet.
  */
object VectorQueries {

  /** Query vectors: every 50th vec_id. */
  def querySet(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  /** Embeddings as the engine's canonical vector-table schema
    * (id, vector, deleted) — SURVEY §1.4. */
  def asVectorTable(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"), col("embedding").as("vector"),
      lit(false).as("deleted"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship: exact batch kNN, k=10, driver threshold setting 50 → 0.5
    // (driver/driver.ts:296-298). Output is rank-based (ids + rn) — integer
    // columns hash-match across engines without float-rounding hazards.
    "v01_knn_exact" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      KnnSearch.knnExact(asVectorTable(emb), querySet(emb),
          k = 10, minSim = KnnSearch.scaleThreshold(50))
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Same search reporting the score, rounded to 6 decimals. Spark and
    // DuckDB both accumulate float elements into a double sequentially, so
    // pre-rounding bits agree (verified by OracleParitySpec).
    "v02_knn_scores" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      KnnSearch.knnExact(asVectorTable(emb), querySet(emb),
          k = 5, minSim = KnnSearch.scaleThreshold(50))
        .select(col("query_id"), col("id"),
          round(col("score"), 6).as("score_r"))
    }),

    // Point lookup by primary key — returns tombstoned rows too
    // (driver/driver.ts:309-312).
    "v03_point_lookup" -> ((s, d) => {
      val nodes = asVectorTable(Tables.embeddings(s, d))
      KnnSearch.pointLookup(nodes, lit(42L))
        .select(col("id"), size(col("vector")).as("dim"), col("deleted"))
    }),

    // Threshold semantics: a strength setting of 99 caps at 0.95
    // (driver/driver.ts:296-298) — count survivors per query.
    "v04_threshold_cap" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      KnnSearch.knnExact(asVectorTable(emb), querySet(emb),
          k = 1000000, minSim = KnnSearch.scaleThreshold(99))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    }),

    // Latest-wins upsert (hnsw.ts:164-167, 497-517): vec_id % 10 == 0 gets
    // its vector reversed; final state checked via the first element.
    "v05_upsert_latest_wins" -> ((s, d) => {
      val cur = asVectorTable(Tables.embeddings(s, d))
      val delta = cur.filter(col("id") % 10 === 0)
        .withColumn("vector", reverse(col("vector")))
      Mutations.upsert(cur, delta)
        .select(col("id"),
          element_at(col("vector"), 1).cast("double").as("first_elem"))
    }),

    // Tombstone delete then search: deleted ids (vec_id % 7 == 0) must not
    // appear in results (hnsw.ts:292) though rows remain in the table.
    "v06_tombstone_search" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val deletes = emb.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("id"))
      val nodes = Mutations.tombstone(asVectorTable(emb), deletes)
      KnnSearch.knnExact(nodes, querySet(emb), k = 10, minSim = 0.5)
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Differential sync (driver/worker.ts:3-44): incoming = all current rows
    // unchanged except vec_id % 3 == 0 reversed, plus new ids (+1000000),
    // plus empty-vector rows (dropped). Output = the minimal delta ids.
    "v07_sync_diff" -> ((s, d) => {
      val cur = asVectorTable(Tables.embeddings(s, d))
      val incoming = cur
        .withColumn("vector",
          when(col("id") % 3 === 0, reverse(col("vector")))
            .otherwise(col("vector")))
        .unionByName(cur.select((col("id") + 1000000L).as("id"),
          col("vector"), col("deleted")))
        .unionByName(cur.limit(0)) // keep schema
      val withEmpty = incoming.unionByName(
        cur.select((col("id") + 2000000L).as("id"),
          slice(col("vector"), 1, 0).as("vector"), col("deleted")))
      Mutations.syncDiff(cur, withEmpty).select(col("id"))
    }),

    // Compaction (astrovault.ts:87-132): physical drop of tombstones.
    "v08_compaction" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val deletes = emb.filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("id"))
      val nodes = Mutations.tombstone(asVectorTable(emb), deletes)
      Mutations.compact(nodes)
        .agg(count(lit(1)).as("n_live"), max(col("id")).as("max_id"))
    }),

    // Euclidean-similarity kNN (similarity.ts:25-41; metric dispatch
    // hnsw.ts:39-49): 1/(1+dist), rank output.
    "v09_knn_euclidean" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      KnnSearch.knnExact(asVectorTable(emb), querySet(emb),
          k = 10, minSim = 0.0, metric = "euclidean")
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Deterministic geometric level assignment — the *intended* semantics of
    // selectLevel (hnsw.ts:68-77; see SURVEY §2-#10 on the reference bug).
    // level = #trailing base-16 zeros of an integer id hash ⇒ P(level≥k) =
    // 16^-k, i.e. geometric with p = 1/M for M=16 — pure integer arithmetic,
    // bit-identical in any engine. Capped at 7 (8 layers, hnsw.ts:51-62).
    "v10_level_histogram" -> ((s, d) => {
      Tables.embeddings(s, d)
        .withColumn("level",
          graft.operators.IndexBuild.levelOf(col("vec_id")))
        .groupBy(col("level")).agg(count(lit(1)).as("n"))
    }),

    // Same search as v01 through the custom bounded-heap aggregate
    // (graft.functions.TopKIds) instead of the window rank: map-side partial
    // aggregation keeps only k candidates per (partition, query), so the
    // shuffle carries O(queries × k) rows — the pqueue.ts eviction pattern
    // as a TypedImperativeAggregate. Oracle: identical semantics to v01.
    "v12_topk_aggregate" -> ((s, d) => {
      VectorFunctions.register(s)
      graft.functions.TopKAggregate.register(s)
      val emb = Tables.embeddings(s, d)
      val live = asVectorTable(emb)
      val scored = live.join(broadcast(querySet(emb)))
        .withColumn("score",
          VectorFunctions.cosineSim(col("query_vec"), col("vector")))
        .filter(col("score") > 0.5 && !isnan(col("score")))
      scored.groupBy(col("query_id"))
        .agg(graft.functions.TopKAggregate.topkIds(
          col("id"), col("score"), 10).as("ids"))
        .select(col("query_id"), posexplode(col("ids")).as(Seq("pos", "id")))
        .select(col("query_id"), col("id"), (col("pos") + 1).cast("int").as("rn"))
    }),

    // Lower similarity floor (0.3) so ranking is exercised across cluster
    // neighbors, not just self-matches (inter-vector cosine tops out ~0.5
    // on this fixture).
    "v13_knn_ranked" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      KnnSearch.knnExact(asVectorTable(emb), querySet(emb),
          k = 10, minSim = 0.3)
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // ColBERT-style late interaction (MaxSim): multi-vector docs (10 token
    // vectors per synthetic doc = vec_id div 10), score = Σ over query
    // vectors of max over doc vectors of cosine. Per-query-vector maxes
    // quantize to integer micros before the BIGINT sum (max is order-free,
    // so the whole score is partition-order-free) — fully hash-checked
    // including the score column.
    "v14_maxsim" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val docVecs = emb.select(expr("vec_id div 10").as("doc_id"),
        col("vec_id"), col("embedding").as("vector"))
      val queryVecs = docVecs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("query_id"), col("vec_id").as("qvec_id"),
          col("vector").as("query_vec"))
      graft.operators.Retrieval.maxSimTopK(docVecs, queryVecs, topK = 10)
    }),

    // Single-level kNN-graph neighbor selection — the batch replacement for
    // HNSW insert wiring (hnsw.ts:82-147): top-M=16 neighbors by cosine
    // with bidirectional union + re-shrink (hnsw.ts:436-489 semantics).
    // Candidates come from anchored-LSH bucket equi-joins (the a01/a07
    // family), NOT an all-pairs theta join: the bucket join carries only
    // (bucket, id), pairs dedup while still narrow, and vectors re-attach
    // by id equi-joins — linear in shared bucket content, never O(n²).
    // The oracle re-derives the same buckets, so candidate generation is
    // itself hash-checked. PlanSpec pins the no-nested-loop shape.
    "v11_knn_graph" -> ((s, d) => {
      VectorFunctions.register(s)
      val embAll = Tables.embeddings(s, d)
      val nodes = embAll.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val anchors = AnnQueries.anchorPlanes(embAll, nBands = 4, bits = 3)
      val keyed = nodes
        .withColumn("b", explode(
          graft.operators.AnnSearch.anchorBucketKeys(col("v"), anchors)))
        .select(col("b"), col("id"))
      val cand = keyed.select(col("b"), col("id").as("src"))
        .join(keyed.select(col("b"), col("id").as("dst")), Seq("b"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
      val scored = cand
        .join(nodes.select(col("id").as("src"), col("v").as("src_vec")), Seq("src"))
        .join(nodes.select(col("id").as("dst"), col("v").as("dst_vec")), Seq("dst"))
        .withColumn("score", VectorFunctions.cosineSim(col("src_vec"), col("dst_vec")))
        .select(col("src"), col("dst"), col("score"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("score").desc, col("dst").asc)
      val directed = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 16)
        .select(col("src"), col("dst"), col("score"))
      // bidirectional union + dedup + shrink back to M (hnsw.ts:436-489)
      val undirected = directed
        .unionByName(directed.select(col("dst").as("src"),
          col("src").as("dst"), col("score")))
        .groupBy(col("src"), col("dst")).agg(max(col("score")).as("score"))
      undirected.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 16)
        .select(col("src"), col("dst"), col("rn"))
    }),

    // Filtered MaxSim-ANN serving — [[graft.VectorStore.searchMaxSimAnn]]'s
    // predicate path (the tower's subset-semantics rule), flag-contract
    // hash-checked (the a03 shape; the banded shortlist itself isn't
    // SQL-derivable): token vectors filter BEFORE banding, the anchor
    // planes derive POSITIONALLY from the FILTERED corpus, and per query
    // the shortlist+rerank must (a) return only matching docs and
    // (b) agree with filtered EXACT MaxSim on the rank-1 doc. A
    // post-filter implementation (corpus-derived anchors, corpus-ranked
    // shortlist) breaks (a) or flips a rank-1 and fails the hash.
    "v15_filtered_maxsim_ann" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val docVecs = emb.select(expr("vec_id div 10").as("doc_id"),
        col("vec_id"), col("embedding").as("vector"))
      val queryVecs = docVecs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("query_id"), col("vec_id").as("qvec_id"),
          col("vector").as("query_vec"))
      val tv = docVecs.filter(col("doc_id") % 3 === 0)
      val anchors = AnnQueries.anchorPlanesPositional(tv, nBands = 4, bits = 3)
      val ann = graft.operators.Retrieval.maxSimRerank(tv, queryVecs,
        topK = 5, tokenHitsPerQvec = 8, anchors = anchors)
      // the GROUND-TRUTH side of the audit — a pure function of the data
      // dir with a Q×5-row result, so it materializes once per process
      // (the AnnQueries exactTower / TextQueries memoTower rule); the ANN
      // tower under test above stays per-call
      val exact = auditTower(s, s"$d|v15|maxsim5")(
        graft.operators.Retrieval.maxSimTopK(tv, queryVecs, topK = 5))
      val subsetOk = ann.groupBy(col("query_id"))
        .agg((sum(when(col("doc_id") % 3 =!= 0, 1).otherwise(0)) === 0)
          .as("subset_ok"))
      val annTop = ann.filter(col("rn") === 1)
        .select(col("query_id"), col("doc_id").as("ann_doc"))
      val exTop = exact.filter(col("rn") === 1)
        .select(col("query_id"), col("doc_id").as("ex_doc"))
      // all three audit relations are <= Q rows — broadcast the attaches
      // so the audit tail never plans exchange+sort pairs over
      // checkpointed/windowed leaves with no usable stats (the a03 rule)
      annTop.join(broadcast(exTop), Seq("query_id"))
        .join(broadcast(subsetOk), Seq("query_id"))
        .select(col("query_id"),
          (col("ann_doc") === col("ex_doc") && col("subset_ok"))
            .as("serves_filtered_top1"))
    }),

    // Diversified serving: MMR top-5 over an exact top-20 shortlist at
    // λ = 0.7 ([[graft.operators.Diversify.mmrTopK]]). Every pairwise
    // similarity quantizes to integer micros before any comparison, so
    // the oracle re-derives the ENTIRE greedy — shortlist membership,
    // every redundancy max, every argmax and tie-break, and the exact
    // BIGINT mmr scores — rank by rank (unrolled CTE stages).
    "v16_mmr_topk" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      graft.operators.Diversify.mmrTopK(asVectorTable(emb), querySet(emb),
        k = 5, shortlist = 20, lambdaMicro = 700000L)
    }),

    // Grouped serving: exact top-10 per query with AT MOST 2 results per
    // group (group = vec_id % 7 — a stand-in for doc/source metadata):
    // [[graft.operators.Diversify.groupedTopK]]. The oracle re-derives
    // both window limits (per-group rank, then final rank over the
    // group-capped survivors) — a shortlist post-filter implementation
    // returns different deep ranks and fails the hash.
    "v17_grouped_knn" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val nodes = asVectorTable(emb)
        .withColumn("grp", pmod(col("id"), lit(7L)))
      graft.operators.Diversify.groupedTopK(nodes, querySet(emb),
        k = 10, perGroup = 2, groupCol = "grp", minSim = 0.3)
    }),

    // Recommendation by example points ([[graft.operators.Recommend
    // .byExamples]]): every 100th vector "likes" its three successors
    // and "dislikes" vec_id+5 — query = mean(pos) − mean(neg), examples
    // excluded BEFORE ranking. The centroid folds in id order with one
    // double→float cast per element, so the oracle re-derives the
    // derived query vectors bit-exactly (list_sort + list_reduce) and
    // every rank follows.
    "v18_recommend" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val ex = emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"),
          explode(array(lit(1L), lit(2L), lit(3L), lit(5L))).as("off"))
        .select(col("query_id"), (col("query_id") + col("off")).as("id"),
          when(col("off") === 5L, lit(-1.0)).otherwise(lit(1.0))
            .as("weight"))
      graft.operators.Recommend.byExamples(asVectorTable(emb), ex,
          k = 10, minSim = 0.3)
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Keyset pagination ([[graft.operators.KnnSearch.searchAfter]]):
    // page 2 of the k=10 search, cursored on page 1's last row — the
    // strictly-after (score, id) filter must reproduce ranks 11..20 of
    // the global order exactly (the oracle re-derives the full ranking
    // and offsets it), including the float-equality tie split.
    "v19_search_after" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val nodes = asVectorTable(emb)
      val qs = querySet(emb)
      val page1 = KnnSearch.knnExact(nodes, qs, k = 10, minSim = -2.0)
      val cursors = page1.filter(col("rn") === 10)
        .select(col("query_id"), col("score").as("after_score"),
          col("id").as("after_id"))
      // restrict to queries that HAVE a full first page, so every output
      // row is a true page-2 row (cursor-less queries would restart at
      // page 1 by design and muddy the oracle)
      // cursors is <= Q rows by construction (rank-10 row per query) —
      // broadcast both attaches (the pageAfter cursorRowsHint rule; a
      // derived cursor relation defeats the stats gate)
      val qs2 = qs.join(broadcast(cursors.select(col("query_id"))),
        Seq("query_id"), "left_semi")
      KnnSearch.searchAfter(nodes, qs2, cursors, k = 10, minSim = -2.0,
          cursorRowsHint = memoCount(d, "queries")(qs.count()))
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Keyset pagination with REALISTIC geometry (v19 at honest
    // thresholds): the embeddings fixture is near-orthogonal (4–8
    // hits/query above 0.3 — v19 paginates at minSim −2 to have depth
    // at all), so this row derives a CLUSTERED fixture from it
    // deterministically ([[clusteredVectors]]: label one-hot + grid-
    // quantized jitter → ~50 same-cluster hits per query above 0.5)
    // and pages at the production-shaped 0.5 floor — the float-equality
    // cursor compare now runs against dense near-ties instead of a
    // starved tail.
    "v20_paged_clustered" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val nodes = clusteredVectors(emb)
      val qs = nodes.filter(col("id") % 50 === 0)
        .select(col("id").as("query_id"), col("vector").as("query_vec"))
      val page1 = KnnSearch.knnExact(nodes, qs, k = 10, minSim = 0.5)
      val cursors = page1.filter(col("rn") === 10)
        .select(col("query_id"), col("score").as("after_score"),
          col("id").as("after_id"))
      val qs2 = qs.join(broadcast(cursors.select(col("query_id"))),
        Seq("query_id"), "left_semi")
      KnnSearch.searchAfter(nodes, qs2, cursors, k = 10, minSim = 0.5,
          cursorRowsHint = memoCount(d, "clqueries")(qs.count()))
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // MMR with a LIVE diversity term (v16 at honest thresholds): on the
    // near-orthogonal fixture every pairwise redundancy is ≈ 0 and the
    // greedy degenerates toward plain relevance order; on the derived
    // clustered fixture ([[clusteredVectors]]) same-cluster candidates
    // carry 0.85+ mutual similarity, so every later rank exercises the
    // real λ-tradeoff — and the 0.5 shortlist floor (the production
    // setting) is meaningful rather than vacuous.
    "v21_mmr_clustered" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val nodes = clusteredVectors(emb)
      val qs = nodes.filter(col("id") % 50 === 0)
        .select(col("id").as("query_id"), col("vector").as("query_vec"))
      graft.operators.Diversify.mmrTopK(nodes, qs, k = 5, shortlist = 20,
        lambdaMicro = 700000L, minSim = 0.5)
    }),

    // Sketched facet THROUGH THE FACADE ([[graft.VectorStore.facetTop]]
    // — the high-cardinality path where exact [[graft.VectorStore
    // .facet]] goes value-cardinality-sized): a persisted store with a
    // label PAYLOAD column, id % 13 tombstoned, a live predicate, and
    // the Misra–Gries two-pass floor at share ≥ 9.5%. Counts above the
    // floor are EXACT (pass 2 recounts candidates), so the oracle is a
    // plain filtered GROUP BY with the same integer-ceiling threshold —
    // a tombstone leaking into the counts, a predicate applied
    // post-sketch, or an off-by-one in the ceiling all fail the hash.
    "v22_facet_top" -> ((s, d) => {
      val store = facetStore(s, d)
      store.facetTop("label", shareMicro = 95000L,
        predicate = Some(col("id") % 7 =!= 0))
    }),

    // Predicate delete THROUGH THE FACADE ([[graft.VectorStore
    // .removeWhere]] — the bulk-retention API: TTL expiry, erasure by
    // payload key): a payload-carrying store drops every label < 3 row
    // in one call, the returned count is asserted against the fixture
    // (and a second identical call must tombstone NOTHING — the
    // idempotence contract), then the standard threshold search runs
    // over the survivors. The oracle searches the fixture WHERE
    // label >= 3 — a tombstone that leaks into results, or a predicate
    // applied to queries instead of rows, hash-mismatches.
    "v23_remove_where" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val store = removeWhereStore(s, d)
      store.search(querySet(emb), k = 10)
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Weighted hybrid THROUGH THE FACADE ([[graft.VectorStore
    // .searchHybridWeighted]]): a store holding both modalities (the
    // fixture's aligned embeddings as vectors, documents registered
    // via putDocuments) serves the alpha-blend in one call — BM25 over
    // its stored documents, floor-free exact cosine over its vectors,
    // fused by the weighted kernel. Same towers, knobs, and blend as
    // t37, so the oracle IS t37's full re-derivation: a facade-glue
    // bug (a tower over the wrong subset, a dropped fetch depth,
    // normalization drift between operator and facade) hash-mismatches.
    "v24_store_hybrid" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val docs = Tables.documents(s, d)
      val store = hybridStore(s, d)
      store.searchHybridWeighted(
        docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("query_id"), col("text")),
        emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"),
            col("embedding").as("query_vec")),
        topK = 10, alphaMicro = 600000L, fetchK = 20)
    }),

    // Keyset corpus scan THROUGH THE FACADE ([[graft.VectorStore
    // .scan]] — the export/scroll surface): page 2 of the tombstoned
    // payload store (the v22 fixture: id % 13 removed), cursored on
    // page 1's last id. The oracle re-derives the live set, page 1's
    // max id, and the strictly-after page — a tombstone leaking into a
    // page, an inclusive cursor, or an unordered page boundary all
    // hash-mismatch. Payload rides the page (id, label).
    "v25_scan_page" -> ((s, d) => {
      val store = facetStore(s, d)
      val cursor = store.scan(limit = 100)
        .agg(max(col("id"))).head().getLong(0)
      store.scan(afterId = cursor, limit = 100)
        .select(col("id"), col("label"))
    }),
  )

  /** Memoized both-modality store for v24 (the facadeAppendStore
    * shape — mutation-free, so one build serves every harness run):
    * embeddings as vectors, the aligned documents registered via
    * putDocuments. */
  /** Fixture-count memo (the AnnQueries dispatch-stats rule): pure
    * functions of the fixture dir, measured once per process and passed
    * through size-hint parameters. */
  private val countMemo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]
  private def memoCount(d: String, key: String)(f: => Long): Long =
    countMemo.getOrElseUpdate((d, key), f)

  /** Exact-tower audit memo (the AnnQueries.exactTower pattern): the
    * ground-truth side of an ANN-vs-exact audit row is a pure function
    * of (data dir, config) with a Q × k-row result — materialize once
    * per process, every later pass reads the checkpoint. */
  private val auditTowerMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.sql.DataFrame]
  // session-keyed (r16, the Tables.load rule): a localCheckpoint's
  // blocks belong to ONE session
  private def auditTower(s: SparkSession, key: String)
      (build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    auditTowerMemo.getOrElseUpdate((s, key), build.localCheckpoint())

  private val hybridStorePaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def hybridStore(s: SparkSession, d: String): graft.VectorStore = {
    val path = hybridStorePaths.getOrElseUpdate(d, {
      val p = graft.util.Fs.tempDirDeletedOnExit("graft-hybrid-store")
      val store = graft.VectorStore.openOrCreate(s, p,
        graft.operators.IndexParams(dim = 64))
      store.addBatch(Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), col("embedding").as("vector")))
      store.putDocuments(Tables.documents(s, d)
        .select(col("doc_id"), col("text")))
      p
    })
    graft.VectorStore.openOrCreate(s, path,
      graft.operators.IndexParams(dim = 64))
  }

  /** Memoized payload-carrying store for v22 (the facadeAppendStore
    * shape): embeddings with their `label` column as addBatch payload,
    * id % 13 tombstoned via the facade. */
  private val facetStorePaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  /** v23's mutation lifecycle, one build per process per data dir (the
    * [[facetStore]] shape applied to the removeWhere contract): ingest
    * is a batch job — the predicate delete, its returned-count assert
    * and the idempotence assert all run ONCE at build, and every later
    * invocation re-opens the persisted store by path (the production
    * read pattern). The r14 form re-built the store and re-ran both
    * removeWhere mutations on every call — two snapshot writes per
    * bench pass for an identical final state. */
  private val removeWhereStorePaths =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def removeWhereStore(s: SparkSession, d: String)
      : graft.VectorStore = {
    val path = removeWhereStorePaths.getOrElseUpdate(d, {
      val p = graft.util.Fs.tempDirDeletedOnExit("graft-removewhere")
      val emb = Tables.embeddings(s, d)
      val store = graft.VectorStore.openOrCreate(s, p,
        graft.operators.IndexParams(dim = 64))
      store.addBatch(emb.select(col("vec_id").as("id"),
        col("embedding").as("vector"), col("label")))
      val expected = emb.filter(col("label") < 3).count()
      val n = store.removeWhere(col("label") < 3)
      require(n == expected,
        s"removeWhere tombstoned $n rows, fixture has $expected")
      require(store.removeWhere(col("label") < 3) == 0L,
        "removeWhere must be idempotent (already-deleted rows don't match)")
      p
    })
    graft.VectorStore.openOrCreate(s, path,
      graft.operators.IndexParams(dim = 64))
  }

  private def facetStore(s: SparkSession, d: String): graft.VectorStore = {
    val path = facetStorePaths.getOrElseUpdate(d, {
      val p = graft.util.Fs.tempDirDeletedOnExit("graft-facet-store")
      val emb = Tables.embeddings(s, d)
      val store = graft.VectorStore.openOrCreate(s, p,
        graft.operators.IndexParams(dim = 64))
      store.addBatch(emb.select(col("vec_id").as("id"),
        col("embedding").as("vector"), col("label")))
      val gone = emb.filter(col("vec_id") % 13 === 0)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
      store.removeMultiple(gone)
      p
    })
    graft.VectorStore.openOrCreate(s, path,
      graft.operators.IndexParams(dim = 64))
  }

  /** A CLUSTERED low-dim vector table derived DETERMINISTICALLY from
    * the embeddings fixture (both engines re-derive it bit-exactly, so
    * it needs no new test data): dim j of vector i is label one-hot
    * (1.0 when label = j−1, 10 clusters) plus jitter — dim-j of the
    * original embedding snapped to a 0.5 grid by the portable
    * floor-quantization rule (floor(x·2 + 0.5)/2 — `round` is NOT
    * cross-engine portable) and scaled by 0.2. Same-label vectors
    * land ≈ 0.85+ mutual cosine, cross-label near 0 — the realistic
    * serving geometry the near-orthogonal fixture can't provide. The
    * arithmetic order is pinned: onehot + ((0.2 · floor)/2), each an
    * IEEE double op, then one double→float cast. */
  private[queries] def clusteredVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").as("id"),
      transform(sequence(lit(1), lit(10)), j =>
        (when(col("label") === (j - 1), lit(1.0d)).otherwise(lit(0.0d)) +
          lit(0.2d) *
            floor(element_at(col("embedding"), j).cast("double") * 2
              + lit(0.5d)) / lit(2.0d))
        .cast("float")).as("vector"))
      .withColumn("deleted", lit(false))

  /** Unrolled-greedy MMR selection stages over an existing `short` CTE
    * with columns (query_id, id, vector DOUBLE[], sim_micro BIGINT):
    * stage i picks rank i's argmax of λ·sim_q − (1−λ)·max-sim-to-
    * selected over the not-yet-selected shortlist — plain window SQL
    * per stage, so DuckDB re-derives the greedy without recursion.
    * Returns the ",\nsel1 AS (...) … selk" CTE tail plus the final
    * SELECT; any shortlist source (exact, IVF, …) composes in front. */
  private[queries] def mmrSelStagesSql(k: Int, lamMicro: Long): String = {
    val oneMinus = 1000000L - lamMicro
    val head =
      s"""sel1 AS (
         |  SELECT query_id, 1 AS rank, id, vector, sim_micro,
         |    $lamMicro * sim_micro AS mmr_micro
         |  FROM short
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim_micro DESC, id) = 1)""".stripMargin
    val stages = (2 to k).map { i =>
      s"""cand$i AS (
         |  SELECT c.query_id, c.id, c.vector, c.sim_micro,
         |    $lamMicro * c.sim_micro - $oneMinus *
         |      max(CAST(floor(list_cosine_similarity(s.vector, c.vector)
         |        * 1000000.0 + 0.5) AS BIGINT)) AS mmr_micro
         |  FROM short c JOIN sel${i - 1} s USING (query_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} x
         |    WHERE x.query_id = c.query_id AND x.id = c.id)
         |  GROUP BY c.query_id, c.id, c.vector, c.sim_micro),
         |sel$i AS (
         |  SELECT * FROM sel${i - 1}
         |  UNION ALL
         |  SELECT query_id, $i AS rank, id, vector, sim_micro, mmr_micro
         |  FROM cand$i
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY mmr_micro DESC, id) = 1)""".stripMargin
    }
    (head +: stages).mkString(",\n") +
      s"\nSELECT query_id, CAST(rank AS INT) AS rank, id, sim_micro, mmr_micro FROM sel$k"
  }

  /** [[mmrSelStagesSql]] fronted by the exact-shortlist `short` CTE —
    * the v16 oracle. */
  private def mmrOracleSql(queryRel: String, s: Int, k: Int,
      lamMicro: Long): String = {
    s"""WITH q AS ($queryRel),
       |short AS (
       |  SELECT query_id, id, vector, sim_micro FROM (
       |    SELECT query_id, id, vector,
       |      CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS sim_micro,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, id) AS rn
       |    FROM (
       |      SELECT q.query_id, e.vec_id AS id,
       |        e.embedding::DOUBLE[] AS vector,
       |        list_cosine_similarity(q.query_vec::DOUBLE[],
       |          e.embedding::DOUBLE[]) AS score
       |      FROM q CROSS JOIN embeddings e)
       |    WHERE NOT isnan(score))
       |  WHERE rn <= $s),
       |""".stripMargin + mmrSelStagesSql(k, lamMicro)
  }

  val oracleSql: Map[String, String] = {
    val q = "SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id % 50 = 0"
    Map(
      "v01_knn_exact" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e)
           |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.5)
           |WHERE rn <= 10""".stripMargin,
      "v02_knn_scores" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e)
           |SELECT query_id, id, round(score, 6) AS score_r FROM (
           |  SELECT query_id, id, score,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.5)
           |WHERE rn <= 5""".stripMargin,
      "v03_point_lookup" ->
        "SELECT vec_id AS id, len(embedding) AS dim, false AS deleted FROM embeddings WHERE vec_id = 42",
      "v04_threshold_cap" ->
        s"""WITH q AS ($q)
           |SELECT q.query_id, count(*) AS n_hits
           |FROM q CROSS JOIN embeddings e
           |WHERE list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) > 0.95
           |GROUP BY q.query_id""".stripMargin,
      "v05_upsert_latest_wins" ->
        """SELECT vec_id AS id,
          |  CAST(CASE WHEN vec_id % 10 = 0 THEN embedding[len(embedding)]
          |            ELSE embedding[1] END AS DOUBLE) AS first_elem
          |FROM embeddings""".stripMargin,
      "v06_tombstone_search" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e
           |  WHERE e.vec_id % 7 <> 0)
           |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.5)
           |WHERE rn <= 10""".stripMargin,
      "v07_sync_diff" ->
        """SELECT vec_id AS id FROM embeddings WHERE vec_id % 3 = 0
          |UNION ALL
          |SELECT vec_id + 1000000 AS id FROM embeddings""".stripMargin,
      "v08_compaction" ->
        "SELECT count(*) AS n_live, max(vec_id) AS max_id FROM embeddings WHERE vec_id % 7 <> 0",
      "v09_knn_euclidean" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    1.0 / (1.0 + list_distance(q.query_vec::DOUBLE[], e.embedding::DOUBLE[])) AS score
           |  FROM q CROSS JOIN embeddings e)
           |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.0)
           |WHERE rn <= 10""".stripMargin,
      "v12_topk_aggregate" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e)
           |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.5)
           |WHERE rn <= 10""".stripMargin,
      "v13_knn_ranked" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e)
           |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.3)
           |WHERE rn <= 10""".stripMargin,
      "v10_level_histogram" ->
        s"""SELECT level, count(*) AS n FROM (
          |  SELECT CAST(CASE
        |    WHEN (vec_id * 2654435761 + 104729) % 16 <> 0 THEN 0
        |    WHEN (vec_id * 2654435761 + 104729) % 256 <> 0 THEN 1
        |    WHEN (vec_id * 2654435761 + 104729) % 4096 <> 0 THEN 2
        |    WHEN (vec_id * 2654435761 + 104729) % 65536 <> 0 THEN 3
        |    WHEN (vec_id * 2654435761 + 104729) % 1048576 <> 0 THEN 4
        |    WHEN (vec_id * 2654435761 + 104729) % 16777216 <> 0 THEN 5
        |    WHEN (vec_id * 2654435761 + 104729) % 268435456 <> 0 THEN 6
          |    ELSE 7 END AS INT) AS level
          |  FROM embeddings)
          |GROUP BY level""".stripMargin,
      "v14_maxsim" ->
        """WITH dv AS (
          |  SELECT vec_id // 10 AS doc_id, vec_id,
          |    embedding::DOUBLE[] AS v
          |  FROM embeddings),
          |qv AS (
          |  SELECT doc_id AS query_id, vec_id AS qvec_id, v AS qvec
          |  FROM dv WHERE doc_id % 10 = 0),
          |mx AS (
          |  SELECT query_id, qvec_id, doc_id, max(s) AS mx FROM (
          |    SELECT q.query_id, q.qvec_id, d.doc_id,
          |      list_cosine_similarity(q.qvec, d.v) AS s
          |    FROM qv q CROSS JOIN dv d)
          |  WHERE NOT isnan(s)
          |  GROUP BY query_id, qvec_id, doc_id),
          |sc AS (
          |  SELECT query_id, doc_id,
          |    sum(CAST(floor(mx * 1000000.0 + 0.5) AS BIGINT)) AS micro
          |  FROM mx GROUP BY query_id, doc_id)
          |SELECT query_id, doc_id,
          |  CAST(micro AS DOUBLE) / 1000000.0 AS score, CAST(rn AS INT) AS rn
          |FROM (
          |  SELECT query_id, doc_id, micro,
          |    row_number() OVER (PARTITION BY query_id
          |                       ORDER BY micro DESC, doc_id) AS rn
          |  FROM sc)
          |WHERE rn <= 10""".stripMargin,
      "v11_knn_graph" ->
        """WITH nodes AS (
          |  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
          |  WHERE vec_id % 10 = 0),
          |anch AS (
          |  SELECT vec_id AS aid, embedding::DOUBLE[] AS av
          |  FROM embeddings WHERE vec_id < 12),
          |nk AS (
          |  SELECT n.id, CAST(a.aid // 3 AS INT) AS band,
          |    string_agg(CASE WHEN list_dot_product(n.v, a.av) >= 0
          |               THEN '1' ELSE '0' END, '' ORDER BY a.aid) AS bk
          |  FROM nodes n CROSS JOIN anch a GROUP BY n.id, a.aid // 3),
          |cand AS (
          |  SELECT DISTINCT n1.id AS src, n2.id AS dst
          |  FROM nk n1 JOIN nk n2
          |    ON n1.band = n2.band AND n1.bk = n2.bk AND n1.id <> n2.id),
          |directed AS (
          |  SELECT src, dst, score FROM (
          |    SELECT c.src, c.dst,
          |      list_cosine_similarity(ns.v, nd.v) AS score,
          |      row_number() OVER (PARTITION BY c.src
          |        ORDER BY list_cosine_similarity(ns.v, nd.v) DESC, c.dst) AS rn
          |    FROM cand c
          |    JOIN nodes ns ON ns.id = c.src
          |    JOIN nodes nd ON nd.id = c.dst)
          |  WHERE rn <= 16),
          |undirected AS (
          |  SELECT src, dst, max(score) AS score FROM (
          |    SELECT src, dst, score FROM directed
          |    UNION ALL
          |    SELECT dst AS src, src AS dst, score FROM directed)
          |  GROUP BY src, dst)
          |SELECT src, dst, CAST(rn AS INT) AS rn FROM (
          |  SELECT src, dst,
          |    row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rn
          |  FROM undirected)
          |WHERE rn <= 16""".stripMargin,
      // The flag CONTRACT (a03's shape) for the filtered MaxSim-ANN
      // tower: DuckDB enumerates the query docs and asserts the expected
      // all-true column — a subset leak or a rank-1 disagreement with
      // filtered exact MaxSim then hash-mismatches.
      "v15_filtered_maxsim_ann" ->
        """SELECT DISTINCT vec_id // 10 AS query_id,
          |  true AS serves_filtered_top1
          |FROM embeddings WHERE (vec_id // 10) % 10 = 0""".stripMargin,
      "v16_mmr_topk" -> mmrOracleSql(q, s = 20, k = 5, lamMicro = 700000L),
      "v17_grouped_knn" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id, e.vec_id % 7 AS grp,
           |    list_cosine_similarity(q.query_vec::DOUBLE[],
           |      e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e),
           |capped AS (
           |  SELECT query_id, id, grp, score,
           |    CAST(gn AS INT) AS gn FROM (
           |    SELECT query_id, id, grp, score,
           |      row_number() OVER (PARTITION BY query_id, grp
           |        ORDER BY score DESC, id) AS gn
           |    FROM scored WHERE score > 0.3 AND NOT isnan(score))
           |  WHERE gn <= 2)
           |SELECT query_id, id, grp, gn, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id, grp, gn,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY score DESC, id) AS rn
           |  FROM capped)
           |WHERE rn <= 10""".stripMargin,
      "v18_recommend" ->
        """WITH ex AS (
          |  SELECT e.vec_id AS query_id, e.vec_id + off AS id,
          |    CASE WHEN off = 5 THEN -1.0 ELSE 1.0 END AS w
          |  FROM embeddings e, UNNEST([1, 2, 3, 5]) AS t(off)
          |  WHERE e.vec_id % 100 = 0),
          |exv AS (
          |  SELECT ex.query_id,
          |    list_sort(list(struct_pack(id := ex.id, w := ex.w,
          |      v := emb.embedding))) AS exs
          |  FROM ex JOIN embeddings emb ON emb.vec_id = ex.id
          |  GROUP BY ex.query_id),
          |cent AS (
          |  SELECT query_id,
          |    [ (list_reduce(list_transform(list_filter(exs, e -> e.w > 0),
          |         e -> e.v[j]::DOUBLE), (a, b) -> a + b)
          |       / len(list_filter(exs, e -> e.w > 0)))
          |      - (CASE WHEN len(list_filter(exs, e -> e.w < 0)) > 0 THEN
          |          list_reduce(list_transform(list_filter(exs, e -> e.w < 0),
          |            e -> e.v[j]::DOUBLE), (a, b) -> a + b)
          |          / len(list_filter(exs, e -> e.w < 0))
          |        ELSE 0.0 END)
          |      for j in range(1, len(exs[1].v) + 1) ]::FLOAT[] AS query_vec
          |  FROM exv),
          |scored AS (
          |  SELECT c.query_id, e.vec_id AS id,
          |    list_cosine_similarity(c.query_vec::DOUBLE[],
          |      e.embedding::DOUBLE[]) AS score
          |  FROM cent c CROSS JOIN embeddings e
          |  WHERE NOT EXISTS (SELECT 1 FROM ex
          |    WHERE ex.query_id = c.query_id AND ex.id = e.vec_id))
          |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
          |  SELECT query_id, id,
          |    row_number() OVER (PARTITION BY query_id
          |      ORDER BY score DESC, id) AS rn
          |  FROM scored WHERE score > 0.3 AND NOT isnan(score))
          |WHERE rn <= 10""".stripMargin,
      "v19_search_after" ->
        s"""WITH q AS ($q),
           |ranked AS (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY score DESC, id) AS rn
           |  FROM (
           |    SELECT q.query_id, e.vec_id AS id,
           |      list_cosine_similarity(q.query_vec::DOUBLE[],
           |        e.embedding::DOUBLE[]) AS score
           |    FROM q CROSS JOIN embeddings e)
           |  WHERE NOT isnan(score)),
           |eligible AS (SELECT query_id FROM ranked WHERE rn = 10)
           |SELECT r.query_id, r.id, CAST(r.rn - 10 AS INT) AS rn
           |FROM ranked r JOIN eligible USING (query_id)
           |WHERE r.rn BETWEEN 11 AND 20""".stripMargin,
      "v20_paged_clustered" ->
        s"""WITH $clSql,
           |q AS (SELECT id AS query_id, vector AS query_vec
           |      FROM cl WHERE id % 50 = 0),
           |ranked AS (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY score DESC, id) AS rn
           |  FROM (
           |    SELECT q.query_id, c.id,
           |      list_cosine_similarity(q.query_vec::DOUBLE[],
           |        c.vector::DOUBLE[]) AS score
           |    FROM q CROSS JOIN cl c)
           |  WHERE score > 0.5 AND NOT isnan(score)),
           |eligible AS (SELECT query_id FROM ranked WHERE rn = 10)
           |SELECT r.query_id, r.id, CAST(r.rn - 10 AS INT) AS rn
           |FROM ranked r JOIN eligible USING (query_id)
           |WHERE r.rn BETWEEN 11 AND 20""".stripMargin,
      "v21_mmr_clustered" ->
        (s"""WITH $clSql,
           |q AS (SELECT id AS query_id, vector AS query_vec
           |      FROM cl WHERE id % 50 = 0),
           |short AS (
           |  SELECT query_id, id, vector, sim_micro FROM (
           |    SELECT query_id, id, vector,
           |      CAST(floor(score * 1000000.0 + 0.5) AS BIGINT) AS sim_micro,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY score DESC, id) AS rn
           |    FROM (
           |      SELECT q.query_id, c.id, c.vector::DOUBLE[] AS vector,
           |        list_cosine_similarity(q.query_vec::DOUBLE[],
           |          c.vector::DOUBLE[]) AS score
           |      FROM q CROSS JOIN cl c)
           |    WHERE score > 0.5 AND NOT isnan(score))
           |  WHERE rn <= 20),
           |""".stripMargin + mmrSelStagesSql(5, 700000L)),
      // v22: live = not tombstoned (id % 13) AND predicate (id % 7);
      // the floor is the integer ceiling ceil(n·share/1e6) the operator
      // computes — mirrored with the same +999999 integer arithmetic.
      "v22_facet_top" ->
        """WITH live AS (
          |  SELECT vec_id AS id, label FROM embeddings
          |  WHERE vec_id % 13 <> 0 AND vec_id % 7 <> 0),
          |tot AS (SELECT count(*) AS n FROM live)
          |SELECT CAST(label AS VARCHAR) AS value, count(*) AS n
          |FROM live CROSS JOIN tot
          |GROUP BY label, tot.n
          |HAVING count(*) >= (tot.n * 95000 + 999999) // 1000000""".stripMargin,
      "v23_remove_where" ->
        s"""WITH q AS ($q),
           |scored AS (
           |  SELECT q.query_id, e.vec_id AS id,
           |    list_cosine_similarity(q.query_vec::DOUBLE[], e.embedding::DOUBLE[]) AS score
           |  FROM q CROSS JOIN embeddings e
           |  WHERE e.label >= 3)
           |SELECT query_id, id, CAST(rn AS INT) AS rn FROM (
           |  SELECT query_id, id,
           |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rn
           |  FROM scored WHERE score > 0.5)
           |WHERE rn <= 10""".stripMargin,
      // v24 serves t37's EXACT composition through the facade (the
      // fixture's embeddings and documents are id-aligned and complete,
      // so the store's lexical corpus equals the documents table) — the
      // oracle is t37's full re-derivation, shared by reference.
      "v24_store_hybrid" -> TextQueries.oracleSql("t37_hybrid_weighted"),
      "v25_scan_page" ->
        """WITH live AS (
          |  SELECT vec_id AS id, label FROM embeddings
          |  WHERE vec_id % 13 <> 0),
          |p1 AS (SELECT id FROM live ORDER BY id LIMIT 100)
          |SELECT id, label FROM live
          |WHERE id > (SELECT max(id) FROM p1)
          |ORDER BY id LIMIT 100""".stripMargin,
    )
  }

  /** The derived clustered fixture ([[clusteredVectors]]) as a DuckDB
    * CTE — the identical arithmetic, token for token: onehot +
    * ((0.2 · floor(x·2 + 0.5))/2), one double→float cast. */
  private def clSql: String =
    """cl AS (
      |  SELECT vec_id AS id,
      |    [ ((CASE WHEN label = j - 1 THEN 1.0 ELSE 0.0 END)
      |       + 0.2 * floor(embedding[j]::DOUBLE * 2 + 0.5) / 2.0)::FLOAT
      |      for j in range(1, 11) ] AS vector
      |  FROM embeddings)""".stripMargin
}

