package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.KnnSearch

/** Keyset pagination ([[operators.KnnSearch.searchAfter]]): pages tile
  * the global order with no overlap and no gap, ties split on id at the
  * page boundary, and a cursor-less query restarts at page 1. */
class SearchAfterSpec extends SparkSpec {
  import spark.implicits._

  // ids 1..4 score IDENTICALLY (same vector); ids 5..6 strictly lower —
  // a page boundary inside the tie must split on id
  private lazy val nodes = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
    (3L, Array(1.0f, 0.0f)), (4L, Array(1.0f, 0.0f)),
    (5L, Array(0.8f, 0.6f)), (6L, Array(0.6f, 0.8f))
  ).toDF("id", "vector").withColumn("deleted", lit(false))
  private lazy val queries =
    Seq((7L, Array(1.0f, 0.0f))).toDF("query_id", "query_vec")

  test("pages tile the order exactly, splitting ties on id") {
    VectorFunctions.register(spark)
    val p1 = KnnSearch.knnExact(nodes, queries, k = 2, minSim = -2.0)
    val cur = p1.filter(col("rn") === 2)
      .select(col("query_id"), col("score").as("after_score"),
        col("id").as("after_id"))
    val p2 = KnnSearch.searchAfter(nodes, queries, cur, k = 2,
        minSim = -2.0)
      .orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    assert(p1.orderBy(col("rn")).select(col("id")).as[Long]
      .collect().toSeq === Seq(1L, 2L))
    assert(p2 === Seq(3L, 4L)) // inside the tie: ids after the cursor's
    val cur2 = KnnSearch.searchAfter(nodes, queries, cur, k = 2,
        minSim = -2.0)
      .filter(col("rn") === 2)
      .select(col("query_id"), col("score").as("after_score"),
        col("id").as("after_id"))
    val p3 = KnnSearch.searchAfter(nodes, queries, cur2, k = 2,
        minSim = -2.0)
      .orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    assert(p3 === Seq(5L, 6L))
  }

  test("duplicate cursor rows collapse to the most-advanced page") {
    VectorFunctions.register(spark)
    val p1 = KnnSearch.knnExact(nodes, queries, k = 2, minSim = -2.0)
    val c1 = p1.filter(col("rn") === 2).select(col("query_id"),
      col("score").as("after_score"), col("id").as("after_id"))
    val p2 = KnnSearch.searchAfter(nodes, queries, c1, k = 2, minSim = -2.0)
    val c2 = p2.filter(col("rn") === 2).select(col("query_id"),
      col("score").as("after_score"), col("id").as("after_id"))
    // both cursors present: page 3 (after c2) must win, no row fan-out
    val out = KnnSearch.searchAfter(nodes, queries, c1.unionByName(c2),
        k = 2, minSim = -2.0)
      .orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    assert(out === Seq(5L, 6L))
  }

  test("a query without a cursor row serves page 1") {
    VectorFunctions.register(spark)
    val emptyCur = Seq.empty[(Long, Double, Long)]
      .toDF("query_id", "after_score", "after_id")
    val out = KnnSearch.searchAfter(nodes, queries, emptyCur, k = 2,
        minSim = -2.0)
      .orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    assert(out === Seq(1L, 2L))
  }

  test("past the last page: empty, not wrapped") {
    VectorFunctions.register(spark)
    // cursor below every real score: nothing is strictly after it
    val last = Seq((7L, -3.0, 999L))
      .toDF("query_id", "after_score", "after_id")
    val out = KnnSearch.searchAfter(nodes, queries, last, k = 2,
      minSim = -2.0)
    assert(out.count() === 0)
  }
}
