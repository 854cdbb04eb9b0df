package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Degenerate-input behavior of the session-2 operators: empty deltas,
  * empty dimension sides, empty corpora — the states a real pipeline hits
  * on its first run or an idle ingest tick. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val params = IndexParams(m = 4, dim = 2, levelMax = 1,
    bucketBits = 2, nBands = 2)

  test("merge with an empty delta is the identity on nodes and edges") {
    val base = Seq((1L, Seq(1f, 0f), false), (2L, Seq(0f, 1f), false))
      .toDF("id", "vector", "deleted")
    val (bn, be) = IndexBuild.build(base, params)
    val empty = Seq.empty[(Long, Seq[Float], Boolean)]
      .toDF("id", "vector", "deleted")
    val (mn, me) = IndexBuild.merge(bn, be, empty, params)
    assert(mn.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    val before = be.select("level", "src", "dst")
      .as[(Int, Long, Long)].collect().toSet
    val after = me.select("level", "src", "dst")
      .as[(Int, Long, Long)].collect().toSet
    assert(after === before)
  }

  test("bloom prune with an empty dim side yields the (empty) plain join") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq.empty[(Long, String)].toDF("dk", "name")
    val out = BloomPrune.prunedEquiJoin(fact, dim, "k", "dk")
    assert(out.count() === 0)
  }

  test("deletion-neighborhood pairs on empty and single-doc corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.deletionNeighborhoodPairs(empty).count() === 0)
    val one = Seq((1L, "only doc here")).toDF("doc_id", "text")
    assert(TextDedup.deletionNeighborhoodPairs(one).count() === 0)
  }

  test("splitAssign on empty input returns empty with the split column") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Sampling.splitAssign(empty, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
    assert(out.columns.contains("split") && out.count() === 0)
  }
}
