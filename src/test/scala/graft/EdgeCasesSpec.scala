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

  test("BM25 over an empty corpus returns no rows") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val qd = Seq((1L, "some words")).toDF("query_id", "text")
    assert(Retrieval.bm25TopK(corpus, qd, topK = 10).count() === 0)
  }

  test("PQ encode/search on an empty vector table yields no codes, no hits") {
    val empty = Seq.empty[(Long, Seq[Float], Boolean)]
      .toDF("id", "vector", "deleted")
    val some = Seq((1L, (0 until 8).map(_.toFloat), false))
      .toDF("id", "vector", "deleted")
    val cb = PqIndex.sampleCodebooks(some, m = 2, subLen = 4, ksub = 1)
    val codes = PqIndex.encode(empty, cb, m = 2, subLen = 4)
    assert(codes.count() === 0)
    val q = Seq((9L, (0 until 8).map(_.toFloat)))
      .toDF("query_id", "query_vec")
    assert(PqIndex.searchAdc(codes, cb, q, 10, 2, 4).count() === 0)
  }

  test("PII scrub passes null text through as null counts and text") {
    val docs = Seq((1L, Option("a@b.co x")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = TextClean.scrub(docs).orderBy("id")
      .select("n_emails", "clean_text")
      .as[(Option[Int], Option[String])].collect()
    assert(out(0) == (Some(1), Some("<EMAIL> x")))
    assert(out(1) == (None, None))
  }

  test("RRF of two empty runs is empty") {
    val e = Seq.empty[(Long, Long, Int)].toDF("query_id", "id", "rn")
    assert(Retrieval.rrfFuse(e, e, topK = 5).count() === 0)
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
