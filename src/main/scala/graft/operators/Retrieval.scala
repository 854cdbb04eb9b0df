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
  * Scale: BM25's candidate generation is the tf⋈query-terms equi-join —
  * an inverted index expressed as dataflow. Cost is Σ_t df(t) over query
  * terms, never corpus × queries; term keys are the shuffle keys (stopword
  * skew is the known hot spot — cap or drop ubiquitous terms via a df
  * ceiling when query sets grow). All corpus statistics (df, avgdl, N) are
  * one aggregation pass each, reusable across query batches.
  *
  * Determinism: per-(query, doc, term) contributions round to 6 decimals
  * and sum as DECIMAL(18,6) — exact, order-free addition (the [[PqIndex]]
  * ADC trick), so scores and ranks reproduce across partitionings and
  * engines; `ln` ulp skew between libms is absorbed by the rounding
  * (the t08 TF-IDF rationale).
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
    * always positive); N counts ALL corpus docs. Output
    * (query_id, id, score, rn). */
  def bm25TopK(docs: DataFrame, queryDocs: DataFrame, topK: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val corpusTerms = terms(docs, idCol, textCol, "id")
    val tf = corpusTerms.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = corpusTerms.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(countDistinct(col(idCol)).as("n"))
      .crossJoin(dl.agg(avg(col("dl")).as("avgdl")))
    val qterms = terms(queryDocs, "query_id", textCol, "query_id").distinct()
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = round(idf * col("tf") * (lit(k1) + 1) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 6)
    // Impact-ordered posting list: the full BM25 weight of (doc, term) is
    // a function of (tf, df, dl, corpus stats) alone, so compute it ONCE
    // on the corpus-sized tf table — per-doc stats join the postings
    // (|tf| rows), never the query-candidate explosion; the query side is
    // then a single term equi-join + sum, and at 100 TB the postings
    // build amortizes across query batches. (On the gate fixture this is
    // time-neutral: its 31-term vocabulary makes every term match ~every
    // doc, so the candidate join itself IS the cost — the degenerate
    // all-stopwords case no term pruning can fix.)
    val postings = tf
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col("id"), contrib.cast("decimal(18,6)").as("c"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    qterms
      .join(postings, Seq("term"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("id"), col("score"),
        col("rn").cast("int").as("rn"))
  }

  /** Reciprocal-rank fusion of two (query_id, id, rn) runs:
    * rrf = Σ 1/(c + rank) over the lists a doc appears in (absent list
    * contributes 0), re-ranked desc with id tiebreak. One full-outer join
    * on narrow rank rows + one window — both runs are already top-k-sized,
    * so this stage is tiny at any corpus scale. */
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
      .select(col("query_id"), col("id"), round(col("rrf"), 8).as("rrf_r"),
        col("rn").cast("int").as("rn"))
  }
}
