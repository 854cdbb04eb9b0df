package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical + hybrid retrieval over the document corpus — the search-side
  * complement to the vector paths ([[KnnSearch]]/[[AnnSearch]]/[[PqIndex]]):
  * BM25 as a distributed inverted-index join, and reciprocal-rank fusion
  * to combine a lexical and a vector run into one hybrid ranking (the
  * standard two-tower retrieval shape).
  *
  * Scale: BM25's candidate generation is the postings⋈query-terms
  * equi-join — an inverted index expressed as dataflow. Cost is Σ_t df(t)
  * over query terms, never corpus × queries. The postings (tf, dl, df per
  * (doc, term)) build in ONE tokenize pass: tf by aggregation, dl and df
  * as window sums over the narrow postings rows — no re-explode, no
  * per-stat join. Stopword skew — the hot shuffle key hazard — is closed
  * by `dfCeilingFrac`: terms present in more than that fraction of the
  * corpus are pruned from the postings BEFORE the candidate join (their
  * idf ≈ ln(1 + (1−f)/f) is near zero for f→1, so they burn the hottest
  * shuffle keys to move near-zero score mass). Document length and corpus
  * stats still count every token, so surviving terms score identically.
  *
  * Determinism (the cross-engine contract): `round(double, n)` is NOT
  * portable — the JVM rounds the shortest decimal representation
  * (`BigDecimal.valueOf`) while C++ engines round the binary value, and
  * the two disagree on boundary values even for bit-identical doubles. So
  * no decimal rounding appears anywhere in the score path. Instead:
  *   - idf quantizes to integer micros via `floor(idf·1e6 + 0.5)` — pure
  *     IEEE ops both engines evaluate identically; the only residual
  *     hazard is libm `ln` 1-ulp skew landing within an ulp of a
  *     half-micro boundary, and that exposure is per DISTINCT TERM (vocab
  *     = thousands), not per (query, doc, term) triple (billions);
  *   - the tf/length factor is +,−,×,÷ over integers and two shared
  *     doubles (avgdl = ΣΣtf / |docs with terms|, one exact-integer sum
  *     and one division) — IEEE arithmetic is bit-deterministic across
  *     engines given identical parenthesization, which the oracle mirrors
  *     token for token;
  *   - per-(query, doc, term) contributions are integer micros
  *     (`floor(idf6·factor + 0.5)`), so the final score is an exact
  *     BIGINT sum — order-free across partitionings — surfaced as
  *     micros/1e6 (one deterministic division).
  */
object Retrieval {

  private def terms(docs: DataFrame, idCol: String, textCol: String,
      outId: String): DataFrame =
    docs.select(col(idCol).as(outId),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)

  /** BM25 top-`topK` docs per query. `queryDocs` is a (query_id, text)
    * relation — queries are bags of words from the same tokenizer as the
    * corpus. idf = ln(1 + (N − df + ½)/(df + ½)) (the Lucene/BM25+ form,
    * always positive); N counts ALL corpus docs. Terms with
    * df > floor(`dfCeilingFrac`·N) are pruned from the postings (stopword
    * ceiling; ≥ 1.0 disables). The query side broadcasts only while its
    * size estimate fits `broadcastBytes` (the [[KnnSearch.knnExact]]
    * gate); past that both sides shuffle on the term key. Output
    * (query_id, id, score DOUBLE, rn). */
  def bm25TopK(docs: DataFrame, queryDocs: DataFrame, topK: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text", dfCeilingFrac: Double = 0.9,
      broadcastBytes: Long = 64L << 20): DataFrame =
    bm25Serve(bm25Postings(docs, k1, b, idCol, textCol, dfCeilingFrac),
      queryDocs, topK, textCol, broadcastBytes)

  /** The (term, id, c) impact-ordered posting table — BM25's INDEX BUILD
    * stage, split out (r15) so a serving facade can derive it once per
    * document generation and every [[bm25Serve]] call joins against the
    * persisted/cached postings instead of re-tokenizing the corpus (the
    * `codes_packed` materialize-at-build rule applied to the lexical
    * tower). `c` is the full integer-micro BM25 weight of (doc, term):
    * a function of (tf, df, dl, corpus stats) alone, so it is
    * query-independent by construction. dl and df attach as window sums
    * over the SAME narrow postings rows (two shuffles of |postings|,
    * zero re-tokenize); N/avgdl ride a broadcast 1-row stats relation.
    * avgdl is ONE exact-integer division — not an engine-internal avg()
    * accumulation — so both engines hold the bit-identical double, and
    * N counts ALL docs (empty docs count toward idf, the reference's
    * corpus-size semantics). */
  def bm25Postings(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      dfCeilingFrac: Double = 0.9): DataFrame = {
    val corpusTerms = terms(docs, idCol, textCol, "id")
    val tf = corpusTerms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val stats = docs.agg(countDistinct(col(idCol)).as("n"))
      .crossJoin(corpusTerms.agg(count(lit(1)).as("s"),
        countDistinct(col("id")).as("ndl")))
      .withColumn("avgdl",
        col("s").cast("double") / col("ndl").cast("double"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val idf6 = floor(idf * lit(1000000.0) + lit(0.5))
    val factor = col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("id"))))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(stats))
      .filter(col("df") <= floor(lit(dfCeilingFrac) * col("n")))
      .select(col("term"), col("id"),
        floor(idf6 * factor + lit(0.5)).as("c"))
  }

  /** Serve BM25 top-`topK` from a prebuilt [[bm25Postings]] table: one
    * term equi-join + exact-BIGINT sum + rank window — at 100 TB the
    * postings build amortizes across every query batch that reuses it.
    */
  def bm25Serve(postings: DataFrame, queryDocs: DataFrame, topK: Int,
      textCol: String = "text",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val qterms = terms(queryDocs, "query_id", textCol, "query_id").distinct()
    val cand = postings.join(
      KnnSearch.maybeBroadcast(qterms, broadcastBytes), Seq("term"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("id").asc)
    cand
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("score_micro"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"),
        col("rn").cast("int").as("rn"))
  }

  /** Unranked MaxSim scores (query_id, doc_id, score_micro BIGINT) — the
    * shared scoring stage of [[maxSimTopK]] and [[maxSimRerank]] (the
    * rerank path must restrict to per-query candidates BEFORE ranking, so
    * it cannot reuse a ranked output). NaN guard per the [[KnnSearch]]
    * rule: a zero-norm token vector scores NaN, which Spark's max would
    * rank above every real similarity — drop those pairs so a padding
    * token never poisons a document's per-query-vector max. */
  private def maxSimScores(docVecs: DataFrame, queryVecs: DataFrame,
      broadcastBytes: Long): DataFrame = {
    val sims = docVecs.select(col("doc_id"), col("vector"))
      .join(KnnSearch.maybeBroadcast(
        queryVecs.select(col("query_id"), col("qvec_id"), col("query_vec")),
        broadcastBytes))
      // barrier: one kernel evaluation per token pair (KnnSearch rule)
      .withColumn("sim", graft.functions.VectorFunctions.once(
        graft.functions.VectorFunctions.cosineSim(
          col("query_vec"), col("vector"))))
      .filter(!isnan(col("sim")))
    sims.groupBy(col("query_id"), col("qvec_id"), col("doc_id"))
      .agg(max(col("sim")).as("mx"))
      .select(col("query_id"), col("doc_id"),
        floor(col("mx") * lit(1000000.0) + lit(0.5)).cast("long").as("mx6"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("mx6")).as("score_micro"))
  }

  /** ColBERT-style late interaction (Khattab & Zaharia, SIGIR 2020):
    * score(q, d) = Σ over query vectors of max over doc vectors of
    * cosine — the multi-vector retrieval scoring that keeps per-token
    * granularity where single-vector search collapses a document to one
    * point. `docVecs` = (doc_id, vector) with MANY rows per doc;
    * `queryVecs` = (query_id, qvec_id, query_vec) likewise.
    *
    * Determinism: the outer Σ quantizes each per-query-vector max to
    * integer micros first (`floor(max·1e6 + 0.5)`) and sums BIGINT —
    * max is order-free, so the whole score is partition-order-free and
    * engine-exact (the [[bm25TopK]] rule). Output (query_id, doc_id,
    * score DOUBLE = micros/1e6, rn).
    *
    * Scale: THIS is the exact variant — cost |docVecs| × |queryVecs|
    * kernel evaluations, the late-interaction analog of
    * [[KnnSearch.knnExact]], with the query side gated by
    * `broadcastBytes`. The production shape at corpus scale is
    * [[maxSimRerank]]: single-vector ANN over token vectors proposes
    * candidate docs, exact MaxSim re-ranks only those. */
  def maxSimTopK(docVecs: DataFrame, queryVecs: DataFrame, topK: Int,
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    maxSimScores(docVecs, queryVecs, broadcastBytes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("doc_id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"),
        col("rn").cast("int").as("rn"))
  }

  /** The scale path for late interaction: single-vector ANN over the
    * token vectors proposes candidate DOCUMENTS (any token hit nominates
    * its whole doc), then exact [[maxSimTopK]] scoring runs restricted
    * to the shortlist — so the quadratic token-pair cost applies to
    * Q × shortlist docs instead of Q × corpus (the standard ColBERT
    * serving architecture). Unlike [[maxSimTopK]], `docVecs` here must
    * ALSO carry a unique per-token `vec_id` column — (doc_id, vec_id,
    * vector) — because the ANN stage addresses individual token vectors;
    * `anchors` follow [[AnnSearch.searchLshAnchored]]. Recall is governed
    * by the ANN stage and pinned by RetrievalSpec against the exact
    * variant. */
  def maxSimRerank(docVecs: DataFrame, queryVecs: DataFrame, topK: Int,
      tokenHitsPerQvec: Int, anchors: Seq[Seq[Array[Float]]],
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val tokenNodes = docVecs
      .select(col("vec_id").as("id"), col("vector"), col("doc_id"))
    // the ANN stage keys on a composite (query doc, query token) — a
    // STRUCT, not a string concat, so ids of any type (and containing
    // any separator) round-trip exactly
    val tokenQueries = queryVecs
      .select(struct(col("query_id").as("q"), col("qvec_id").as("t"))
        .as("query_id"), col("query_vec"))
    val hits = AnnSearch.searchLshAnchored(
      tokenNodes.select(col("id"), col("vector")), tokenQueries,
      k = tokenHitsPerQvec, minSim = -2.0, anchors,
      broadcastBytes = broadcastBytes)
    val candDocs = hits
      .select(col("query_id").getField("q").as("query_id"), col("id"))
      .join(KnnSearch.maybeBroadcast(
        tokenNodes.select(col("id"), col("doc_id")), broadcastBytes),
        Seq("id"))
      .select(col("query_id"), col("doc_id")).distinct()
    val shortDocVecs = docVecs
      .join(candDocs.select(col("doc_id")).distinct(), Seq("doc_id"))
    // score the union of candidate docs UNRANKED, restrict to each
    // query's own candidates, THEN rank once — ranking the union first
    // could evict a query's candidate behind another query's doc
    maxSimScores(shortDocVecs, queryVecs, broadcastBytes)
      .join(candDocs, Seq("query_id", "doc_id"), "left_semi")
      .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id").asc))
        .cast("int"))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("doc_id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"),
        col("rn"))
  }

  /** Reciprocal-rank fusion of two (query_id, id, rn) runs:
    * rrf = Σ 1/(c + rank) over the lists a doc appears in (absent list
    * contributes 0), re-ranked desc with id tiebreak. One full-outer join
    * on narrow rank rows + one window — both runs are already top-k-sized,
    * so this stage is tiny at any corpus scale. The surfaced score
    * quantizes via `floor(rrf·1e8 + 0.5)` (same portability rationale as
    * [[bm25TopK]] — no `round(double)` in any cross-engine-checked path). */
  /** Weighted-score hybrid fusion — the alpha-blend every production
    * retrieval stack offers next to RRF (Weaviate/Pinecone "hybrid
    * alpha"): the two runs' score scales are incomparable (BM25 micros
    * vs cosine in [−1, 1]), so each run min-max normalizes PER QUERY to
    * [0, 1e6] integer micros, then
    * `hybrid = alpha·normA + (1e6 − alpha)·normB` as an exact BIGINT —
    * order-free, hash-checkable, no float accumulation anywhere past
    * the input scores. Absent-from-one-run docs contribute norm 0 on
    * that side (the RRF absent-list rule); a constant-score run
    * (mx = mn, including a single-candidate list) normalizes to a full
    * 1e6 — a lone hit is a full-strength hit, not a zero. Both runs are
    * top-k-sized, so the fusion never touches corpus-scale data.
    *
    * Determinism across engines: input scores quantize via
    * `floor(score·1e6 + 0.5)` (recovers BM25's integer micros exactly;
    * cosine doubles are bit-identical per OracleParitySpec), and the
    * normalization division runs in double with operands ≤ 1e14 —
    * exactly representable, so both engines floor the same quotient.
    *
    * @param alphaMicro weight of `runA` in micros (0..1e6); 5e5 = equal
    * @return (query_id, id, hybrid_micro BIGINT, rn INT) */
  def hybridWeighted(runA: DataFrame, runB: DataFrame, topK: Int,
      alphaMicro: Long = 500000L): DataFrame = {
    require(alphaMicro >= 0L && alphaMicro <= 1000000L,
      s"alphaMicro must be in [0, 1000000], got $alphaMicro")
    def norm(run: DataFrame, out: String): DataFrame = {
      val wq = Window.partitionBy(col("query_id"))
      run.select(col("query_id"), col("id"),
          floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long")
            .as("sm"))
        .withColumn("mn", min(col("sm")).over(wq))
        .withColumn("mx", max(col("sm")).over(wq))
        .select(col("query_id"), col("id"),
          when(col("mx") === col("mn"), lit(1000000L))
            .otherwise(floor(
              (col("sm") - col("mn")).cast("double") * lit(1000000.0) /
                (col("mx") - col("mn")).cast("double")).cast("long"))
            .as(out))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hybrid_micro").desc, col("id").asc)
    norm(runA, "na").join(norm(runB, "nb"),
        Seq("query_id", "id"), "full_outer")
      .withColumn("hybrid_micro",
        lit(alphaMicro) * coalesce(col("na"), lit(0L)) +
        lit(1000000L - alphaMicro) * coalesce(col("nb"), lit(0L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("id"), col("hybrid_micro"),
        col("rn").cast("int").as("rn"))
  }

  def rrfFuse(runA: DataFrame, runB: DataFrame, topK: Int, c: Int = 60)
      : DataFrame = {
    val a = runA.select(col("query_id"), col("id"), col("rn").as("rn_a"))
    val b = runB.select(col("query_id"), col("id"), col("rn").as("rn_b"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("id").asc)
    a.join(b, Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("rn_a")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(c) + col("rn_b")), lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("id"),
        (floor(col("rrf") * lit(100000000.0) + lit(0.5)).cast("double") /
          lit(100000000.0)).as("rrf_r"),
        col("rn").cast("int").as("rn"))
  }
}
