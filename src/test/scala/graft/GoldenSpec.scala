package graft

import org.apache.spark.sql.functions._

/** Golden end-to-end semantics (SURVEY §5.4): the embeddings fixture is 10
  * labeled clusters, so a vector's neighbors should be dominated by its own
  * label, and fixed query results are pinned against drift. */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  // NOTE: FIXTURES.md describes the label column as cosine-aligned cluster
  // ground truth, but in the actual data same-label and cross-label pairs
  // have identical cosine distributions (avg ≈ 0 both; measured in DuckDB).
  // Label-dominance is therefore NOT a valid semantic check on this
  // fixture; recall is asserted against exact search instead (AnnSpec,
  // IvfFeaturizerSpec).

  test("pinned golden result: v01 top hit per query is the query itself") {
    val rows = SparkEntry.queries("v01_knn_exact")(spark, sf001)
      .filter(col("rn") === 1)
      .select("query_id", "id").as[(Long, Long)].collect().toList
    assert(rows.nonEmpty && rows.forall { case (q, id) => q === id })
  }

  test("pinned golden result: entry() returns stable row count at sf0.001") {
    // drift alarm for the driver's smoke query — update deliberately if
    // semantics change
    assert(SparkEntry.entry(spark).count() === 10L)
  }
}
