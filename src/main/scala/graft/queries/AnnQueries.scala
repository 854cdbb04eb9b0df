package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{AnnSearch, IndexBuild, IndexParams, KnnSearch}

/** ANN index + search queries. No DuckDB oracle (the hyperplane LSH and the
  * graph walk aren't reasonably SQL-expressible), so the driver records the
  * weaker rows-only check; correctness is covered by AnnSpec's recall and
  * invariant tests against the exact in-engine oracle.
  */
object AnnQueries {

  private def params = IndexParams(m = 12, levelMax = 3, bucketBits = 4, nBands = 4)

  /** Build-once-per-process index per data dir, persisted to a temp path and
    * reloaded — searches run against the saved index (the real usage
    * pattern: build is a batch job, search consumes its parquet output). */
  private val builtPaths = scala.collection.concurrent.TrieMap.empty[String, String]
  private def indexFor(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val path = builtPaths.getOrElseUpdate(d, {
      val p = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
      val emb = Tables.embeddings(s, d)
      val (nodes, edges) = IndexBuild.build(VectorQueries.asVectorTable(emb), params)
      IndexBuild.save(nodes, edges, params, p)
      p
    })
    val (n, e, _) = IndexBuild.load(s, path)
    (n, e)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LSH-bucketed ANN search (the scale path of v01's exact search).
    "a01_ann_lsh_search" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      AnnSearch.searchLsh(VectorQueries.asVectorTable(emb),
        VectorQueries.querySet(emb), k = 10, minSim = 0.0,
        params.copy(bucketBits = 3))
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Index build structural summary: edge counts + node counts per level
    // (build runs once per process; see indexFor).
    "a02_index_build_stats" -> ((s, d) => {
      VectorFunctions.register(s)
      val (_, edges) = indexFor(s, d)
      edges.groupBy(col("level"))
        .agg(count(lit(1)).as("n_edges"),
          countDistinct(col("src")).as("n_nodes"))
    }),

    // IVF coarse-quantizer ANN (the k-means alternative to LSH): train a
    // small codebook, probe the 3 nearest cells per query.
    "a04_ivf_search" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val nodesDf = VectorQueries.asVectorTable(emb)
      val centroids = graft.operators.IvfIndex.train(nodesDf, k = 10, iters = 3)
      graft.operators.IvfIndex.search(nodesDf, centroids,
          VectorQueries.querySet(emb), k = 10, minSim = -2.0, nProbe = 3)
        .select(col("query_id"), col("id"), col("rn"))
    }),

    // Graph-traversal ANN search over the saved index, reporting per-query
    // recall vs the exact top-k.
    "a03_ann_graph_recall" -> ((s, d) => {
      VectorFunctions.register(s)
      val emb = Tables.embeddings(s, d)
      val nodesDf = VectorQueries.asVectorTable(emb)
      val queriesDf = VectorQueries.querySet(emb)
      val (nodes, edges) = indexFor(s, d)
      val approx = AnnSearch.searchGraph(nodes, edges, queriesDf,
        k = 10, minSim = -2.0, params, ef = 64, itersPerLevel = 2)
        .select(col("query_id"), col("id"))
      val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0)
        .select(col("query_id").as("eq"), col("id").as("eid"))
      exact.join(approx,
          exact("eq") === approx("query_id") && exact("eid") === approx("id"),
          "left_outer")
        .groupBy(col("eq").as("query_id"))
        .agg((count(col("id")).cast("double") / count(lit(1))).as("recall"))
    }),
  )

  val oracleSql: Map[String, String] = Map.empty
}
