package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** BM25 + RRF hybrid retrieval: self-retrieval sanity, rank determinism,
  * and fusion properties on synthetic runs. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val queryDocs = docs.filter(col("doc_id") % 100 === 0)
    .select(col("doc_id").as("query_id"), col("text"))

  test("BM25: a document used as its own query stays in its top-20") {
    // rank-1 self-retrieval is NOT guaranteed: the query side keeps only
    // DISTINCT terms (standard BM25) and length normalization can promote
    // shorter docs sharing the high-idf terms — on this near-uniform
    // synthetic vocabulary that genuinely happens. Presence in the top-20
    // is the stable property (the hybrid test below shows RRF + the
    // vector tower restores rank 1).
    val top = Retrieval.bm25TopK(docs, queryDocs, topK = 20)
    val nq = queryDocs.count()
    val selfHits = top.filter(col("query_id") === col("id")).count()
    assert(selfHits == nq, s"self in top-20 for $selfHits of $nq queries")
  }

  test("BM25 ranks are partition-order independent (integer-micro sums)") {
    val a = Retrieval.bm25TopK(docs, queryDocs, topK = 10)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val b = Retrieval.bm25TopK(docs.repartition(13), queryDocs.repartition(5),
        topK = 10)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(a == b)
  }

  test("BM25 df ceiling prunes ubiquitous terms; rare terms still score") {
    // sf0.01 fixture: 30 terms at ~0.8 df-fraction, one ('dup') at ~0.05.
    // A 0.5 ceiling prunes the 30 stopword-like terms from the postings,
    // so every surviving contribution comes from 'dup' — results shrink to
    // docs containing it, and only for queries that contain it themselves.
    val capped = Retrieval.bm25TopK(docs, queryDocs, topK = 10,
      dfCeilingFrac = 0.5)
    val hitDocs = capped.select("id").distinct().as[Long].collect().toSet
    assert(hitDocs.nonEmpty)
    val dupDocs = docs.filter(col("text").contains("dup"))
      .select("doc_id").as[Long].collect().toSet
    assert(hitDocs.subsetOf(dupDocs),
      s"${(hitDocs -- dupDocs).size} hits lack the only surviving term")
    val hitQueries = capped.select("query_id").distinct().as[Long].collect().toSet
    val dupQueries = queryDocs.filter(col("text").contains("dup"))
      .select("query_id").as[Long].collect().toSet
    assert(hitQueries == dupQueries)
  }

  test("BM25 ranks unchanged when the df ceiling does not bind") {
    // fixture max df-fraction ~0.8 < 0.9 default — the default ceiling
    // prunes nothing, so results match an uncapped run exactly
    val dflt = Retrieval.bm25TopK(docs, queryDocs, topK = 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    val uncapped = Retrieval.bm25TopK(docs, queryDocs, topK = 10,
      dfCeilingFrac = 1.0)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(dflt == uncapped)
  }

  test("BM25 query-side broadcast fallback (gate=0) matches the broadcast plan") {
    val dflt = Retrieval.bm25TopK(docs, queryDocs, topK = 10)
      .as[(Long, Long, Double, Int)].collect().toSet
    val shuffled = Retrieval.bm25TopK(docs, queryDocs, topK = 10,
      broadcastBytes = 0L)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(dflt == shuffled)
  }

  test("BM25: a query with no shared terms returns nothing; empty query drops out") {
    val weird = Seq((9001L, "zzzqx9 qqqpw7"), (9002L, ""))
      .toDF("query_id", "text")
    val top = Retrieval.bm25TopK(docs, weird, topK = 10)
    assert(top.isEmpty)
  }

  test("MaxSim: hand-computed late-interaction scores; identical doc ranks first") {
    // doc 1 = two orthogonal unit vectors; doc 2 = copies of e1 only.
    // query = doc 1's vectors: maxsim(q, d1) = 1 + 1 = 2 (each query
    // vector finds its twin); maxsim(q, d2) = 1 + 0 (e2 finds nothing)
    val e1 = Seq(1.0f, 0.0f); val e2 = Seq(0.0f, 1.0f)
    val docVecs = Seq(
      (1L, 10L, e1), (1L, 11L, e2),
      (2L, 20L, e1), (2L, 21L, e1)
    ).toDF("doc_id", "vec_id", "vector")
    val queryVecs = Seq((1L, 10L, e1), (1L, 11L, e2))
      .toDF("query_id", "qvec_id", "query_vec")
    val out = graft.operators.Retrieval.maxSimTopK(docVecs, queryVecs, 10)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(out(1L) === ((2.0, 1)))
    assert(out(2L) === ((1.0, 2)))
  }

  test("MaxSim rerank: ANN-proposed shortlist reproduces the exact top ranks") {
    val emb = Tables.embeddings(spark, sf001)
    val docVecs = emb.select(expr("vec_id div 10").as("doc_id"),
      col("vec_id"), col("embedding").as("vector"))
    val queryVecs = docVecs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("query_id"), col("vec_id").as("qvec_id"),
        col("vector").as("query_vec"))
    val exact = graft.operators.Retrieval.maxSimTopK(docVecs, queryVecs, 5)
      .select("query_id", "doc_id", "rn").as[(Long, Long, Int)]
      .collect().toSet
    val anchors = graft.queries.AnnQueries.anchorPlanes(emb,
      nBands = 4, bits = 3)
    // generous token-hit budget → candidate sets cover the true top docs
    val rr = graft.operators.Retrieval.maxSimRerank(docVecs, queryVecs,
        topK = 5, tokenHitsPerQvec = 200, anchors)
      .select("query_id", "doc_id", "rn").as[(Long, Long, Int)]
      .collect().toSet
    // rank-1 parity is the serving property that matters; deeper ranks may
    // differ where ANN recall truncates the tail
    val exact1 = exact.filter(_._3 == 1)
    val rr1 = rr.filter(_._3 == 1)
    assert(rr1 === exact1, s"rank-1 mismatch: $rr1 vs $exact1")
  }

  test("RRF: doc in both runs outranks same-rank docs in one run") {
    val runA = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "id", "rn")
    val runB = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("query_id", "id", "rn")
    val fused = Retrieval.rrfFuse(runA, runB, topK = 10)
      .select("id", "rn").as[(Long, Int)].collect().toMap
    // 10 scores 1/61+1/62; 12 scores 1/61 alone; 11 scores 1/62 alone
    assert(fused(10L) == 1)
    assert(fused(12L) == 2)
    assert(fused(11L) == 3)
  }

  test("RRF: disjoint runs fuse to the union with list-local ordering") {
    val runA = Seq((1L, 10L, 1)).toDF("query_id", "id", "rn")
    val runB = Seq((2L, 20L, 1)).toDF("query_id", "id", "rn")
    val fused = Retrieval.rrfFuse(runA, runB, topK = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    assert(fused == Set((1L, 10L), (2L, 20L)))
  }

  test("hybridWeighted: hand-computed blend; absent side scores 0; " +
      "constant run normalizes to full strength") {
    // run A scores (q1): 10 → 0.9, 11 → 0.5, 12 → 0.1 → norms 1e6, 5e5, 0
    val runA = Seq((1L, 10L, 0.9), (1L, 11L, 0.5), (1L, 12L, 0.1))
      .toDF("query_id", "id", "score")
    // run B (q1): 11 → 2.0, 13 → 1.0 → norms 1e6, 0; 10 and 12 absent
    val runB = Seq((1L, 11L, 2.0), (1L, 13L, 1.0))
      .toDF("query_id", "id", "score")
    val fused = Retrieval.hybridWeighted(runA, runB, topK = 10,
        alphaMicro = 600000L)
      .select("id", "hybrid_micro").as[(Long, Long)].collect().toMap
    assert(fused(11L) === 600000L * 500000L + 400000L * 1000000L) // both
    assert(fused(10L) === 600000L * 1000000L)  // absent from B → nb 0
    assert(fused(13L) === 0L + 400000L * 0L)   // B's min normalizes to 0
    assert(fused(12L) === 0L)                  // A's min, absent from B
    // a constant-score run (single candidate) normalizes to full 1e6
    val lone = Retrieval.hybridWeighted(
      Seq((2L, 20L, 0.123)).toDF("query_id", "id", "score"),
      Seq.empty[(Long, Long, Double)].toDF("query_id", "id", "score"),
      topK = 5, alphaMicro = 500000L)
      .select("id", "hybrid_micro").as[(Long, Long)].collect().toMap
    assert(lone(20L) === 500000L * 1000000L)
    // alpha bounds reject
    intercept[IllegalArgumentException](
      Retrieval.hybridWeighted(runA, runB, 5, alphaMicro = 1000001L))
  }

  test("hybrid t10 query runs and keeps self-hit in the top ranks") {
    val res = graft.queries.TextQueries.queries("t10_hybrid_rrf")(spark, sf001)
    // the query doc is identical on both towers (lex self-match + cosine
    // self-sim 1.0) — fusion must keep it at rank 1
    val firsts = res.filter(col("rn") === 1)
      .select("query_id", "id").as[(Long, Long)].collect()
    assert(firsts.nonEmpty && firsts.forall { case (q, id) => q == id })
  }
}
