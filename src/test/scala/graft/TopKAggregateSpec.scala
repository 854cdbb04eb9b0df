package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("topk_ids: ordered by score desc then id asc, bounded at k") {
    TopKAggregate.register(spark)
    val df = Seq(
      ("g1", 1L, 0.9), ("g1", 2L, 0.7), ("g1", 3L, 0.9), // tie: 1 before 3
      ("g1", 4L, 0.8), ("g2", 5L, 0.1))
      .toDF("g", "id", "score")
    val got = df.groupBy($"g")
      .agg(TopKAggregate.topkIds($"id", $"score", 3).as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("g1") === Seq(1L, 3L, 4L)) // 0.9/id1, 0.9/id3, 0.8/id4; 0.7 evicted
    assert(got("g2") === Seq(5L))
  }

  test("partial-aggregate merge across partitions matches single partition") {
    TopKAggregate.register(spark)
    val data = (1L to 1000L).map(i => ("g", i, (i % 97).toDouble))
    val one = data.toDF("g", "id", "score").coalesce(1)
      .groupBy($"g").agg(TopKAggregate.topkIds($"id", $"score", 10))
      .as[(String, Seq[Long])].head._2
    val many = data.toDF("g", "id", "score").repartition(8)
      .groupBy($"g").agg(TopKAggregate.topkIds($"id", $"score", 10))
      .as[(String, Seq[Long])].head._2
    assert(one === many)
    assert(one.length === 10)
  }

  test("agg path result equals the window-rank path on real data") {
    val viaWindow = SparkEntry.queries("v01_knn_exact")(spark, sf001)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val viaAgg = SparkEntry.queries("v12_topk_aggregate")(spark, sf001)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("SQL surface: topk_ids usable from spark.sql") {
    TopKAggregate.register(spark)
    val got = spark.sql(
      "SELECT topk_ids(id, score, 2) FROM VALUES (1L, 0.5D), (2L, 0.9D), (3L, 0.1D) AS t(id, score)")
      .as[Seq[Long]].head
    assert(got === Seq(2L, 1L))
  }
}
