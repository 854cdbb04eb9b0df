package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Recommend

/** Recommendation by example points ([[operators.Recommend.byExamples]]):
  * derived-query arithmetic on a hand-computed fixture, example
  * exclusion before ranking, and the loud no-positives contract. */
class RecommendSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nodes = Seq(
    (1L, Array(1.0f, 0.0f)),   // pos example
    (2L, Array(0.0f, 1.0f)),   // pos example
    (3L, Array(-1.0f, 0.0f)),  // neg example
    (4L, Array(0.9f, 0.35f)),  // near the derived direction
    (5L, Array(0.5f, 0.5f)),   // exactly on mean(pos) direction
    (6L, Array(-0.9f, -0.3f))  // opposite
  ).toDF("id", "vector").withColumn("deleted", lit(false))

  test("query = mean(pos) - mean(neg); examples excluded; ranks exact") {
    VectorFunctions.register(spark)
    // mean(pos) = (0.5, 0.5); mean(neg) = (-1, 0); query = (1.5, 0.5)
    val ex = Seq(
      (100L, 1L, 1.0), (100L, 2L, 1.0), (100L, 3L, -1.0)
    ).toDF("query_id", "id", "weight")
    val out = Recommend.byExamples(nodes, ex, k = 10)
      .orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    // survivors: 4, 5, 6 — cos((1.5,.5), (0.9,.35)) > cos(..., (0.5,.5))
    // > cos(..., (-0.9,-.3)); examples 1/2/3 never appear
    assert(out === Seq(4L, 5L, 6L))
  }

  test("no negative examples: query is the positive mean") {
    VectorFunctions.register(spark)
    val ex = Seq((7L, 1L, 1.0), (7L, 2L, 1.0)).toDF("query_id", "id", "weight")
    val out = Recommend.byExamples(nodes, ex, k = 1)
      .select(col("id")).as[Long].collect().toSeq
    assert(out === Seq(5L)) // (0.5, 0.5) is exactly the mean direction
  }

  test("a query with no positive examples raises, never returns empty") {
    VectorFunctions.register(spark)
    val ex = Seq((9L, 3L, -1.0)).toDF("query_id", "id", "weight")
    val e = intercept[Exception] {
      Recommend.byExamples(nodes, ex, k = 3).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("positive examples") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("positive examples")),
      s"unexpected: $e")
  }

  test("a query whose example ids ALL miss the node table raises too " +
      "(it must not silently vanish from the output)") {
    VectorFunctions.register(spark)
    // query 20 resolves normally; query 21's ids all miss — before the
    // left-join guard it produced no packed row and disappeared
    val ex = Seq(
      (20L, 1L, 1.0),
      (21L, 777L, 1.0), (21L, 778L, -1.0)
    ).toDF("query_id", "id", "weight")
    val e = intercept[Exception] {
      Recommend.byExamples(nodes, ex, k = 3).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("positive examples")),
      s"unexpected: $e")
  }

  test("byExamplesWith: an arm-served shortlist gets the same " +
      "derivation, exclusion and ranks as the exact path") {
    VectorFunctions.register(spark)
    val ex = Seq(
      (100L, 1L, 1.0), (100L, 2L, 1.0), (100L, 3L, -1.0)
    ).toDF("query_id", "id", "weight")
    val exact = Recommend.byExamples(nodes, ex, k = 10)
      .orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    // serve = the exact tower itself: composition must be identical;
    // fetchK must arrive over-fetched by the per-query example count
    var seenFetchK = -1
    val armed = Recommend.byExamplesWith(nodes, ex, k = 10) {
      (qs, fetchK) =>
        seenFetchK = fetchK
        graft.operators.KnnSearch.knnExact(nodes, qs, fetchK,
          minSim = -2.0)
    }.orderBy(col("rn")).select(col("id")).as[Long].collect().toSeq
    assert(seenFetchK === 13) // k + 3 resolved examples
    assert(armed === exact)
  }

  test("example ids absent from nodes fold out of the centroid") {
    VectorFunctions.register(spark)
    // id 99 doesn't exist: centroid = mean of the one resolvable positive
    val ex = Seq((11L, 1L, 1.0), (11L, 99L, 1.0)).toDF("query_id", "id", "weight")
    val top = Recommend.byExamples(nodes, ex, k = 1)
      .select(col("id")).as[Long].collect().toSeq
    assert(top === Seq(4L)) // nearest to (1, 0) excluding id 1 itself
  }
}
