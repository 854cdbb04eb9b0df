package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al., NeurIPS 2023 — "Data Selection
  * for Language Models via Importance Resampling"): score every raw
  * document by how target-like its hashed-token bag is under two
  * add-one-smoothed bag-of-buckets models — importance weight
  * log w(d) = Σ_tokens [ln q̂(b(tok)) − ln p̂(b(tok))] with p̂ fit on the
  * raw corpus and q̂ on a small high-quality target set — then keep the
  * top-k by weight plus Gumbel noise (Gumbel-top-k draws k docs without
  * replacement with probability ∝ w, the paper's sampler). The
  * principled replacement for hand-tuned source mixtures whenever a
  * target corpus exists.
  *
  * Determinism/portability (the repo-wide integer-micro contract):
  * bucket assignment is the salted-md5 [[Sampling.hashKey]]; each
  * per-bucket ln quantizes to integer micros (`floor(x·1e6 + 0.5)` — the
  * libm-ln 1-ulp exposure is per DISTINCT BUCKET, the t14 rule); per-doc
  * weights are exact BIGINT sums of quantized per-token terms; the
  * Gumbel key adds a per-doc quantized −ln(−ln(u)) with u an exact
  * rational of the salted hash — so selection is bit-identical on any
  * engine, at any parallelism.
  *
  * Scale: one tokenize pass over each corpus; the model tables are
  * ≤ `buckets` rows (broadcast — no shuffle touches the corpus except
  * the per-doc sum, keyed by doc id); top-k is orderBy+limit
  * (TakeOrdered: partition-local heaps + driver merge, never a global
  * sort). The target corpus is small by construction — its pass is
  * negligible next to the raw scan. */
object ImportanceResampling {

  private def toks(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Hashed feature bucket of a token (salted md5 → [0, buckets)). */
  def bucketOf(tok: Column, buckets: Int): Column =
    pmod(Sampling.hashKey(tok, "dsir"), lit(buckets.toLong))

  /** Integer-micro quantized ln of the add-one-smoothed bucket
    * probability (cnt + 1) / (total + buckets). */
  private def lnp6(cnt: Column, total: Column, buckets: Int): Column =
    floor(log((cnt + lit(1.0)) / (total + lit(buckets.toDouble)))
      * lit(1000000.0) + lit(0.5)).cast("long")

  /** Per-bucket log-likelihood-ratio table (b, llr6): integer-micro
    * ln q̂(b) − ln p̂(b) for every bucket the RAW corpus populates
    * (a raw token always finds its bucket here; buckets the target
    * never saw smooth to the add-one floor). ≤ `buckets` rows. */
  def bucketLlr(raw: DataFrame, target: DataFrame, buckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rawB = toks(raw, idCol, textCol)
      .withColumn("b", bucketOf(col("tok"), buckets))
    val tgtB = toks(target, idCol, textCol)
      .withColumn("b", bucketOf(col("tok"), buckets))
    val np = rawB.groupBy(col("b")).agg(count(lit(1)).as("np"))
    val nq = tgtB.groupBy(col("b")).agg(count(lit(1)).as("nq"))
    // totals = Σ per-bucket counts: one ≤`buckets`-row agg over the
    // model tables instead of a SECOND full tokenize pass per corpus
    // (exact BIGINT equality — every token lands in exactly one bucket)
    val pTot = np.agg(sum(col("np")).as("p_total"))
    val qTot = nq.agg(sum(col("nq")).as("q_total"))
    np.join(nq, Seq("b"), "left")
      .na.fill(0L, Seq("nq"))
      .crossJoin(broadcast(pTot)).crossJoin(broadcast(qTot))
      .select(col("b"),
        (lnp6(col("nq"), col("q_total"), buckets)
          - lnp6(col("np"), col("p_total"), buckets)).as("llr6"))
  }

  /** Importance weight per raw document:
    * (idCol, n_tokens, logw_micro) with logw_micro the exact BIGINT sum
    * of per-token quantized log-likelihood ratios. Docs with no tokens
    * drop (no positions to score — the t14 rule).
    *
    * `model`, when set, is a prebuilt [[bucketLlr]] table — the DSIR
    * MODEL is a build artifact (train once on a corpus snapshot, score
    * many batches against it — the paper's own usage), so a serving
    * caller passes the persisted table and this call costs ONE tokenize
    * pass over `raw` instead of three (r16). None trains inline. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 512, idCol: String = "doc_id",
      textCol: String = "text",
      model: Option[DataFrame] = None): DataFrame = {
    require(buckets > 0, s"buckets $buckets")
    val llr = model.getOrElse(
      bucketLlr(raw, target, buckets, idCol, textCol))
    toks(raw, idCol, textCol)
      .withColumn("b", bucketOf(col("tok"), buckets))
      .join(broadcast(llr), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("llr6")).as("logw_micro"))
      .select(col("id").as(idCol), col("n_tokens"), col("logw_micro"))
  }

  /** Gumbel-top-k importance resample: the k raw docs with the largest
    * logw_micro + gumbel_micro keys (noiseSalt = None degenerates to
    * deterministic top-k by weight — the argmax variant). Output:
    * (idCol, n_tokens, logw_micro, key_micro), ties broken by id. */
  def resample(raw: DataFrame, target: DataFrame, k: Int,
      buckets: Int = 512, noiseSalt: Option[String] = Some("dsir-g"),
      idCol: String = "doc_id", textCol: String = "text",
      model: Option[DataFrame] = None): DataFrame = {
    require(k > 0, s"k $k")
    val w = importanceWeights(raw, target, buckets, idCol, textCol, model)
    val gumbel6 = noiseSalt match {
      case Some(salt) =>
        // u = (h % 1e9 + 1) / (1e9 + 1) ∈ (0, 1) exactly (the
        // weightedSample construction); key = logw + ⌊−ln(−ln u)·1e6⌉
        val u = (pmod(Sampling.hashKey(col(idCol), salt),
          lit(1000000000L)) + lit(1)).cast("double") / lit(1000000001.0)
        floor(-log(-log(u)) * lit(1000000.0) + lit(0.5)).cast("long")
      case None => lit(0L)
    }
    w.withColumn("key_micro", col("logw_micro") + gumbel6)
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
  }
}
