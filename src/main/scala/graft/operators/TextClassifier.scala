package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable text classification for corpus curation — the multinomial
  * Naive Bayes family behind classic training-data pipeline filters
  * (fastText-style language ID / quality gates à la CCNet: score every
  * document against a small labeled set, keep or route by predicted
  * class). The reference engine has no classifier; this is engine
  * surface a 100 TB curation pipeline needs next to dedup/sampling
  * (SURVEY §1.4's pipeline pitch).
  *
  * Training is two narrow aggregations over the tokenized corpus
  * ((label, term) counts + per-class totals) — map-side combinable,
  * shuffling only vocabulary-sized rows. The model is a COMPLETE
  * (term ∈ V) × (class) Laplace-smoothed log-likelihood matrix (V·C
  * rows — class count is small by construction, so the matrix is
  * vocabulary-, not corpus-, sized) plus a C-row class-stats table.
  * Scoring joins doc term counts against the matrix on `term` — a
  * postings-style equi-join, no broadcast of anything corpus-sized, no
  * per-doc work beyond its own tokens.
  *
  * DETERMINISM (the t09 BM25 rule): every log-weight quantizes to
  * integer micros (`floor(ln(·)·1e6 + 0.5)` — BIGINT) at the one point
  * a float exists; scores are then exact integer sums/products, so
  * ranking and hashes are partition-order-free and engine-portable.
  *
  * Model columns:
  *  - weights (label, term, w_micro): w = ln((tf(term,label)+1) /
  *    (tokens(label) + V)) — Laplace-smoothed multinomial likelihood;
  *  - classStats (label, prior_micro, defw_micro): prior =
  *    ln(docs(label)/docsTotal); defw = the zero-count weight
  *    ln(1/(tokens(label)+V)), applied to OUT-OF-VOCABULARY tokens at
  *    scoring time (in-vocabulary zero-count pairs are already explicit
  *    rows of the complete matrix).
  */
object TextClassifier {

  final case class NbModel(weights: DataFrame, classStats: DataFrame)

  private val Micro = 1000000.0

  private def tokens(docs: DataFrame, idCol: String, textCol: String,
      extra: Seq[String] = Nil): DataFrame =
    docs.select((col(idCol) +: extra.map(col)) :+
        explode(split(col(textCol), " ")).as("term"): _*)
      .filter(length(col("term")) > 0)

  /** Train multinomial NB from labeled docs (`idCol`, `textCol`,
    * `labelCol`). Distributed end-to-end; the only driver-side values
    * are the vocabulary size and total doc count (two scalar
    * aggregates). */
  def trainNaiveBayes(docs: DataFrame, labelCol: String = "label",
      idCol: String = "doc_id", textCol: String = "text"): NbModel = {
    val toks = tokens(docs, idCol, textCol, Seq(labelCol))
      .select(col(idCol), col(labelCol).as("label"), col("term"))
    val tf = toks.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val classTok = toks.groupBy(col("label"))
      .agg(count(lit(1)).as("tok_total"))
    val docsPerClass = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("ndocs"))
    // scalar corpus constants: |V| and N_docs (one row each — not data).
    // The vocabulary distinct materializes ONCE (checkpoint) and serves
    // both the |V| count and the complete-matrix crossJoin — r16: the
    // two separate distinct() subtrees each re-tokenized the corpus.
    val vocab = toks.select(col("term")).distinct().localCheckpoint()
    val v = vocab.count()
    val nDocs = docs.count()
    require(nDocs > 0, "cannot train a classifier on an empty corpus")
    // complete V × C matrix: vocabulary crossJoin the (tiny, broadcast)
    // class list, zero-count pairs taking the Laplace floor — explicit
    // rows, so scoring never branches on in-vocabulary misses
    val complete = vocab.crossJoin(
        broadcast(classTok.select(col("label"), col("tok_total"))))
      .join(tf, Seq("label", "term"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    val weights = complete.select(col("label"), col("term"),
      floor(log((col("cnt") + lit(1)).cast("double") /
          (col("tok_total") + lit(v)).cast("double")) * lit(Micro) +
        lit(0.5)).cast("long").as("w_micro"))
    val classStats = classTok.join(docsPerClass, Seq("label"))
      .select(col("label"),
        floor(log(col("ndocs").cast("double") / lit(nDocs.toDouble)) *
          lit(Micro) + lit(0.5)).cast("long").as("prior_micro"),
        floor(log(lit(1.0) / (col("tok_total") + lit(v)).cast("double")) *
          lit(Micro) + lit(0.5)).cast("long").as("defw_micro"))
    NbModel(weights, classStats)
  }

  /** Score every doc against every class:
    * (idCol, label, score_micro) where score = prior + Σ_t n_t·w(t,c)
    * with OOV tokens taking the class's zero-count default weight —
    * exact BIGINT arithmetic after the model's one quantization. Docs
    * with no tokens score the bare prior. */
  def scoreNaiveBayes(docs: DataFrame, model: NbModel,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val counts = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("n"))
    val tot = docs.select(col(idCol))
      .join(counts.groupBy(col(idCol)).agg(sum(col("n")).as("tot")),
        Seq(idCol), "left")
      .withColumn("tot", coalesce(col("tot"), lit(0L)))
    // in-vocabulary contribution: postings-style term equi-join; the
    // model side is V·C rows (vocabulary-sized — broadcast when small,
    // shuffle join past the gate, the knnExact rule)
    val perLabel = counts
      .join(KnnSearch.maybeBroadcast(model.weights, broadcastBytes),
        Seq("term"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("n") * col("w_micro")).as("sw"),
        sum(col("n")).as("n_in"))
    tot.crossJoin(broadcast(model.classStats))
      .join(perLabel, Seq(idCol, "label"), "left")
      .select(col(idCol), col("label"),
        (coalesce(col("sw"), lit(0L)) +
          (col("tot") - coalesce(col("n_in"), lit(0L))) *
            col("defw_micro") +
          col("prior_micro")).as("score_micro"))
  }

  /** Argmax classification: (idCol, label, score_micro) — one row per
    * doc, ties broken on label ascending (deterministic). */
  def classify(docs: DataFrame, model: NbModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("label").asc)
    scoreNaiveBayes(docs, model, idCol, textCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("label"), col("score_micro"))
  }

  /** Embedding-space counterpart of [[classify]]: semi-supervised kNN
    * label propagation (auto-labeling a corpus from a small labeled
    * seed set — the other standard curation-filter shape). Each query
    * takes the MAJORITY label of its k nearest labeled vectors
    * ([[KnnSearch.knnExact]] semantics: rank ties on id, so the
    * neighbor set — and therefore the vote — is deterministic and
    * engine-portable); vote ties break on label ascending. `labeled` is
    * (id, vector, `labelCol`); output (query_id, label, votes, margin)
    * where margin = votes(top) − votes(runner-up) (k when unanimous) —
    * the abstention knob: route low-margin docs to review instead of
    * trusting the vote. */
  /** `queryCount` ≥ 0 arms the bounded-shortlist broadcast (the
    * [[graft.operators.AnnSearch]] arithmetic-gate rule): the hit list
    * is ≤ Q × k narrow rows BY CONSTRUCTION, but its Catalyst estimate
    * (windowed join output) defeats the stats gate, so without the hint
    * the label attach plans a sort-merge join that shuffles the
    * corpus-sized LABEL side by id. With the bound in budget the hits
    * broadcast and the label table is never shuffled. −1 keeps the
    * stats-driven plan. */
  def knnClassify(labeled: DataFrame, queries: DataFrame, k: Int,
      metric: String = "cosine", labelCol: String = "label",
      queryCount: Long = -1L,
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val nodes =
      if (labeled.columns.contains("deleted")) labeled
      else labeled.withColumn("deleted", lit(false))
    val hits = KnnSearch.knnExact(nodes.select(col("id"), col("vector"),
        col("deleted")), queries, k, minSim = -2.0, metric)
    val hitsFit = queryCount >= 0 &&
      queryCount * k.toLong * 40L * 4L <= broadcastBytes
    // pre-cluster by query_id ONCE: hash(query_id) satisfies both the
    // (query_id, label) vote aggregation's and the rank/margin windows'
    // required distributions, so the old agg-exchange → window-exchange
    // pair collapses to a single shuffle (the AnnSearch dedupTopEf rule)
    val votes = (if (hitsFit) broadcast(hits) else hits)
      .join(labeled.select(col("id"), col(labelCol).as("label")), Seq("id"))
      .repartition(col("query_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    votes
      .withColumn("rn", row_number().over(w))
      .withColumn("margin",
        col("votes") - coalesce(lead(col("votes"), 1).over(w), lit(0L)))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("label"), col("votes"), col("margin"))
  }
}
