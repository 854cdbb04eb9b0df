package graft

import graft.operators.{AdaptiveSearch, IndexParams, KnnSearch}
import graft.queries.VectorQueries

class AdaptiveSearchSpec extends SparkSpec {
  import spark.implicits._

  test("decision rules: size gate, then skew gate") {
    import AdaptiveSearch._
    assert(decide(1000, 0.5) === UseExact)   // tiny → exact regardless of skew
    assert(decide(1000000, 0.2) === UseIvf)  // big + hot bucket → IVF
    assert(decide(1000000, 0.001) === UseLsh) // big + uniform → LSH
  }

  test("stats: share in [0,1]; adaptive result equals exact on the fixture") {
    val emb = Tables.embeddings(spark, sf001)
    val nodesDf = VectorQueries.asVectorTable(emb)
    val queriesDf = VectorQueries.querySet(emb)
    val params = IndexParams(bucketBits = 4)

    val (n, share) = AdaptiveSearch.stats(nodesDf, params)
    assert(n === 500L && share >= 0.0 && share <= 1.0)

    // 500 nodes → the size gate picks EXACT, so results match knnExact
    val (strategy, result) = AdaptiveSearch.search(
      nodesDf, queriesDf, k = 5, minSim = 0.2, params)
    assert(strategy === AdaptiveSearch.UseExact)
    val got = result.select("query_id", "id").as[(Long, Long)].collect().toSet
    val want = KnnSearch.knnExact(nodesDf, queriesDf, 5, 0.2)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(got === want)
  }
}
