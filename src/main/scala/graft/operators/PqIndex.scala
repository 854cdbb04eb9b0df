package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Product quantization (PQ) — the memory-compression scale path for vector
  * search (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011). The reference engine keeps every full vector in RAM
  * (`hnsw.ts` stores `Array<number>` per node); at 100 TB that is the
  * dominant cost, and PQ is the standard answer: split each `dim` vector
  * into `m` subspaces, quantize each subspace against its own `ksub`-entry
  * codebook, and keep only the `m` small codes per vector (64-dim float =
  * 256 B → 8 B at m=8). Search then never touches the original vectors:
  * asymmetric distance computation (ADC) scores a query against the
  * CODES via a per-query lookup table of query-to-centroid distances.
  *
  * Spark shape, sized for 100 TB:
  *  - codebooks are tiny (m × ksub rows) and BROADCAST everywhere; the
  *    corpus never shuffles during encode (explode to n×m narrow slices,
  *    map-side argmin, partial-agg collapse back to n×m codes).
  *  - ADC: the per-query LUT (Q × m × ksub distances) broadcasts; the codes
  *    table map-side joins it, and the Σ-over-subspaces aggregation is
  *    map-side combinable, so the only exchange carries Q × n NARROW
  *    (query, id, partial-sum) rows — the same shuffle class as
  *    [[KnnSearch.knnExact]]'s score pass but over 32× smaller rows, and
  *    composable with [[IvfIndex]] cell probing (IVF-PQ) to cut `n` to
  *    `n × nProbe / k` first.
  *  - ADC partial sums are DECIMAL, not DOUBLE: addition order then cannot
  *    change the total, so ranks are reproducible across partitionings AND
  *    engines (the d06/q26 order-independence trick applied to distances).
  *
  * Like [[IvfIndex.sampleCodebook]], the codebook here is plain data
  * selection (sub-slices of the `ksub` lowest-id live vectors) so an
  * external engine can re-derive every code and every ADC total from the
  * same parquet — the trained variant would drop in the same dataflow.
  */
object PqIndex {

  /** Sub-codebooks as a (sub, code, centroid) table: subspace `sub`'s
    * centroids are the `[sub*subLen, (sub+1)*subLen)` slices of the `ksub`
    * lowest-id live vectors, codes numbered in id order. */
  def sampleCodebooks(nodes: DataFrame, m: Int, subLen: Int, ksub: Int)
      : DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    live.orderBy(col("id").asc).limit(ksub)
      .withColumn("code",
        row_number().over(Window.orderBy(col("id").asc)) - 1)
      .select(col("code"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("vector"))
      .select(col("sub"), col("code"),
        slice(col("vector"), col("sub") * subLen + 1, lit(subLen))
          .as("centroid"))
  }

  /** Encode: per (id, subspace) the euclidean-nearest sub-centroid, ties
    * toward the lowest code. Returns (id, sub, code) — the compressed
    * corpus. Codebooks broadcast; the n×m×ksub scored candidates stay
    * narrow and collapse map-side (the [[IvfIndex.assign]] argmax shape). */
  def encode(nodes: DataFrame, codebooks: DataFrame, m: Int, subLen: Int)
      : DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    live
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("vector"))
      .select(col("id"), col("sub"),
        slice(col("vector"), col("sub") * subLen + 1, lit(subLen))
          .as("subvec"))
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("__key", struct(
        (lit(0.0) - VectorFunctions.euclideanDist(col("subvec"),
          col("centroid"))).as("negd"),
        (lit(0) - col("code")).as("negcode")))
      .groupBy(col("id"), col("sub"))
      .agg(expr("max_by(code, __key)").as("code"))
  }

  /** ADC top-k: build the per-query LUT (distance from each query subvector
    * to each sub-centroid), join the codes against it, sum over subspaces,
    * rank ascending (ties id asc). Distances round to 8 decimals and sum
    * as DECIMAL(18,8) — exact, order-free addition, so the same ranks come
    * out of any partitioning or engine. Output (query_id, id, rn) matches
    * the other search paths. */
  def searchAdc(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      k: Int, m: Int, subLen: Int): DataFrame = {
    val lut = queries
      .select(col("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("query_vec"))
      .select(col("query_id"), col("sub"),
        slice(col("query_vec"), col("sub") * subLen + 1, lit(subLen))
          .as("qsub"))
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        round(VectorFunctions.euclideanDist(col("qsub"), col("centroid")), 8)
          .cast("decimal(18,8)").as("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("id").asc)
    codes.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("d")).as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("rn"))
  }

  /** ADC shortlist + exact re-rank — the standard PQ quality tail: the
    * compressed scan keeps only `shortlist` candidates per query cheap,
    * then the TRUE euclidean distance re-ranks just those (Q × shortlist
    * full-vector reads instead of Q × n). The shortlist stays narrow
    * (query_id, id) and broadcasts back onto the vector table, so the
    * full corpus is touched once, map-side, and only for scoring the
    * survivors. Output (query_id, id, rn) by true distance. */
  def searchAdcRerank(nodes: DataFrame, codes: DataFrame,
      codebooks: DataFrame, queries: DataFrame, k: Int, shortlist: Int,
      m: Int, subLen: Int): DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    val cand = searchAdc(codes, codebooks, queries, shortlist, m, subLen)
      .select(col("query_id"), col("id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("id").asc)
    live.select(col("id"), col("vector"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("dist",
        VectorFunctions.euclideanDist(col("query_vec"), col("vector")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("rn"))
  }
}
