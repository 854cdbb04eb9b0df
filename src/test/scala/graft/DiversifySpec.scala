package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.Diversify

/** MMR diversified top-k ([[operators.Diversify.mmrTopK]]): greedy
  * semantics on a hand-built two-cluster fixture (diversity must break
  * up the near-duplicate cluster), the λ = 1 ≡ plain-kNN degeneracy,
  * per-query shape invariants, and candidate-order independence. */
class DiversifySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters near +x and +y, one query pointing between them
  // but closer to +x: plain kNN top-3 is all-x-cluster; MMR at any
  // λ < 1 must interleave a +y member at rank 2 or 3
  private lazy val nodes = Seq(
    (1L, Array(1.00f, 0.00f)),
    (2L, Array(0.99f, 0.05f)),
    (3L, Array(0.98f, 0.08f)),
    (4L, Array(0.00f, 1.00f)),
    (5L, Array(0.05f, 0.99f))
  ).toDF("id", "vector").withColumn("deleted", lit(false))

  private lazy val queries =
    Seq((100L, Array(0.90f, 0.44f))).toDF("query_id", "query_vec")

  test("rank 1 is the exact top hit; later ranks trade off redundancy") {
    VectorFunctions.register(spark)
    val out = Diversify.mmrTopK(nodes, queries, k = 3, shortlist = 5,
        lambdaMicro = 500000L)
      .orderBy(col("rank")).as[(Long, Int, Long, Long, Long)].collect()
    assert(out.length === 3)
    // exact order by cosine is 3, 2, 1 (cluster x), then 5, 4 — rank 1
    // must be id 3; diversity must pull a +y member (4 or 5) into the
    // top 3 ahead of the redundant x-cluster rest
    assert(out(0)._3 === 3L)
    assert(out.map(_._3).toSet.intersect(Set(4L, 5L)).nonEmpty,
      s"no +y cluster member in ${out.map(_._3).toSeq}")
    // ranks are 1..k, ids distinct
    assert(out.map(_._2).toSeq === Seq(1, 2, 3))
    assert(out.map(_._3).distinct.length === 3)
  }

  test("lambda = 1e6 degenerates to exact kNN order") {
    VectorFunctions.register(spark)
    val mmr = Diversify.mmrTopK(nodes, queries, k = 4, shortlist = 5,
        lambdaMicro = 1000000L)
      .orderBy(col("rank")).select(col("id")).as[Long].collect()
    val exact = graft.operators.KnnSearch.knnExact(nodes, queries,
        k = 4, minSim = -2.0)
      .orderBy(col("rn")).select(col("id")).as[Long].collect()
    assert(mmr.toSeq === exact.toSeq)
  }

  test("output is independent of candidate arrival order") {
    VectorFunctions.register(spark)
    def run(n: org.apache.spark.sql.DataFrame) =
      Diversify.mmrTopK(n, queries, k = 3, shortlist = 5,
          lambdaMicro = 300000L)
        .orderBy(col("rank")).as[(Long, Int, Long, Long, Long)].collect()
        .toSeq
    assert(run(nodes) === run(nodes.orderBy(col("id").desc).repartition(7)))
  }

  test("mmrFromCandidates: any (query_id, id, score) arm feeds the same " +
      "greedy — exact-shortlist composition reproduces mmrTopK") {
    VectorFunctions.register(spark)
    val short = graft.operators.KnnSearch.knnExact(nodes, queries,
      k = 5, minSim = -2.0)
    val viaCands = graft.operators.Diversify.mmrFromCandidates(short,
        nodes, k = 3, lambdaMicro = 500000L)
      .orderBy(col("rank")).as[(Long, Int, Long, Long, Long)].collect().toSeq
    val direct = graft.operators.Diversify.mmrTopK(nodes, queries,
        k = 3, shortlist = 5, lambdaMicro = 500000L)
      .orderBy(col("rank")).as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(viaCands === direct)
  }

  test("groupedTopK: per-group quota is exact over the full corpus, " +
      "not a shortlist post-filter") {
    VectorFunctions.register(spark)
    // group A holds the 3 best hits, group B the rest: with perGroup=2
    // and k=4, ranks 3-4 must come from group B even though group A's
    // third hit outscores them
    val g = nodes.withColumn("grp",
      when(col("id") <= 3L, "A").otherwise("B"))
    val out = graft.operators.Diversify.groupedTopK(g, queries,
        k = 4, perGroup = 2, groupCol = "grp")
      .orderBy(col("rn"))
      .select(col("id"), col("grp"), col("gn"), col("rn"))
      .as[(Long, String, Int, Int)].collect()
    assert(out.length === 4)
    assert(out.map(_._2).toSeq === Seq("A", "A", "B", "B"))
    assert(out.map(_._3).toSeq === Seq(1, 2, 1, 2)) // per-group ranks
    assert(out.count(_._2 == "A") === 2) // id 1 (3rd-best A) capped out
  }

  test("groupedTopK: tombstones and threshold behave like knnExact") {
    VectorFunctions.register(spark)
    val g = nodes
      .withColumn("deleted", col("id") === 3L) // kill the top hit
      .withColumn("grp", lit("all"))
    val out = graft.operators.Diversify.groupedTopK(g, queries,
        k = 10, perGroup = 10, groupCol = "grp", minSim = 0.5)
      .select(col("id")).as[Long].collect().toSet
    assert(!out.contains(3L))
    val exact = graft.operators.KnnSearch.knnExact(
        nodes.withColumn("deleted", col("id") === 3L), queries,
        k = 10, minSim = 0.5)
      .select(col("id")).as[Long].collect().toSet
    assert(out === exact)
  }

  test("k > shortlist hits the require; k capped by candidate count") {
    VectorFunctions.register(spark)
    intercept[IllegalArgumentException] {
      Diversify.mmrTopK(nodes, queries, k = 6, shortlist = 5)
    }
    // 5 nodes, shortlist 10 >= k 7 is legal but only 5 candidates exist:
    // the greedy returns all 5, ranks 1..5
    val out = Diversify.mmrTopK(nodes, queries, k = 7, shortlist = 7)
      .orderBy(col("rank")).as[(Long, Int, Long, Long, Long)].collect()
    assert(out.map(_._2).toSeq === Seq(1, 2, 3, 4, 5))
  }

  test("mmrFromCandidates: duplicate (query_id, id) rows collapse — " +
      "no id ever appears at two ranks, result equals the dedup'd run") {
    VectorFunctions.register(spark)
    val short = graft.operators.KnnSearch.knnExact(nodes, queries,
      k = 5, minSim = -2.0)
    // double every candidate row (an arm that double-emits an id)
    val doubled = short.unionByName(short)
    def run(c: org.apache.spark.sql.DataFrame) =
      Diversify.mmrFromCandidates(c, nodes, k = 3,
          lambdaMicro = 500000L)
        .orderBy(col("rank")).as[(Long, Int, Long, Long, Long)]
        .collect().toSeq
    val dup = run(doubled)
    assert(dup.map(_._3).distinct.length === dup.length,
      s"duplicate id served twice: ${dup.map(_._3)}")
    assert(dup === run(short))
  }

  test("SQL-reachable kernel: a zero-norm candidate (undefined cosine) " +
      "is skipped, not scored as neutral redundancy") {
    VectorFunctions.register(spark)
    val out = spark.sql(
      """SELECT mmr_select(array(
        |  named_struct('id', 1L, 'sim_micro', 900000L,
        |    'vector', array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))),
        |  named_struct('id', 2L, 'sim_micro', 800000L,
        |    'vector', array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))),
        |  named_struct('id', 3L, 'sim_micro', 700000L,
        |    'vector', array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))
        |), 3, 500000L, 'cosine') AS r""".stripMargin)
      .selectExpr("explode(r) AS e").selectExpr("e.id")
      .as[Long].collect().toSeq
    // id 2 is zero-norm: pairwise cosine to it is NaN — it must be
    // dropped entirely, leaving ids 1 and 3 in relevance order
    assert(out === Seq(1L, 3L))
  }
}
