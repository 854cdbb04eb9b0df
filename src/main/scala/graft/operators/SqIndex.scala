package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Scalar quantization (SQ8) — the second standard vector-compression
  * family alongside [[PqIndex]] (the FAISS `SQ` index type): each DIMENSION
  * is quantized independently to an 8-bit code against per-dimension
  * [lo, hi] bounds learned from the corpus. 4× smaller rows than float32
  * (vs PQ's 32×), but with a far simpler, training-light build (one min/max
  * aggregation — no codebooks, no Lloyd) and a SYMMETRIC integer distance:
  * quantize the query with the same bounds and rank by
  * Σ (q_code − d_code)² — exact BIGINT arithmetic end to end, so scores
  * are bit-identical on any engine and any partitioning with NO float
  * determinism caveats at all (stronger than PQ ADC's quantized-LUT
  * contract). The usual quality ladder applies: SQ8 shortlist → exact
  * re-rank tail ([[PqIndex.rerankScored]]).
  *
  * Spark shape, sized for 100 TB:
  *  - bounds are a dim-sized table (one narrow posexplode aggregation,
  *    map-side combinable) and BROADCAST everywhere;
  *  - encode touches the corpus once, map-side (posexplode → code →
  *    collapse back to one ARRAY<INT> row per vector);
  *  - search crossJoins packed codes against the (size-gated) broadcast
  *    query codes and evaluates one codegen'd [[graft.functions.SqL2Expr]]
  *    per pair — n × Q rows, the exact-kNN shuffle class, over 4× smaller
  *    scanned rows.
  */
object SqIndex {

  private def live(nodes: DataFrame): DataFrame =
    if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
    else nodes

  /** Per-dimension quantization bounds over the live corpus:
    * (pos, lo, hi) — pos is 0-based. One narrow aggregation; the result
    * is dim-sized and broadcasts. */
  def trainBounds(nodes: DataFrame): DataFrame =
    live(nodes)
      .select(posexplode(col("vector")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))

  /** code = clamp(⌊(x − lo)/(hi − lo)·256⌋, 0, 255); a constant dimension
    * (hi = lo) codes to 0. All arithmetic runs in DOUBLE with this exact
    * parenthesization — IEEE ops both engines evaluate identically on the
    * identical widened floats, the BM25-factor portability rule. */
  private def codeOf(x: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0)).otherwise(
      least(lit(255), greatest(lit(0),
        floor((x.cast("double") - lo.cast("double")) /
          (hi.cast("double") - lo.cast("double")) * lit(256.0))))
    ).cast("int")

  /** Encode a vector table against `bounds` → (id, codes ARRAY<INT>
    * ordered by pos) — the packed 1-byte-per-dimension representation.
    * `idCol`/`vecCol` let the same encoder serve corpus (id, vector) and
    * query (query_id, query_vec) tables. Bounds broadcast; the input is
    * touched once, map-side. */
  def encode(df: DataFrame, bounds: DataFrame, idCol: String = "id",
      vecCol: String = "vector"): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .join(broadcast(bounds), Seq("pos"))
      .select(col(idCol), col("pos"),
        codeOf(col("x"), col("lo"), col("hi")).as("c"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("codes"))

  /** Fraction of vector components lying OUTSIDE the frozen [lo, hi]
    * bounds, in MICRO units (⌊frac·10⁶⌋) — the drift statistic for the
    * SQ/BQ append lifecycle ([[graft.VectorStore.appendSqIndex]]):
    * out-of-range components CLIP to code 0/255, so a rising
    * out-of-bounds fraction means the frozen bounds no longer cover the
    * data and quantization error grows one-sidedly — the retrain
    * signal. One narrow posexplode + broadcast-bounds join, two counts;
    * O(n·dim) slim rows, map-side combinable. */
  def outOfBoundsMicro(df: DataFrame, bounds: DataFrame,
      vecCol: String = "vector"): Long = {
    val row = df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .join(broadcast(bounds), Seq("pos"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("x") < col("lo") || col("x") > col("hi"), 1L)
          .otherwise(0L)).as("oob"))
      .head()
    val n = row.getLong(0)
    if (n == 0L) 0L else row.getLong(1) * 1000000L / n
  }

  /** Symmetric SQ top-k: quantize the queries with the corpus bounds,
    * rank by the exact integer squared-L2 over codes (asc, ties id asc).
    * Output (query_id, id, d2 BIGINT, rn) — d2 is exact, so the score
    * column itself is engine-portable. The query-code table broadcasts
    * while it fits `broadcastBytes`; past that both sides stay
    * partitioned (SHUFFLE_REPLICATE_NL, the [[KnnSearch.knnExact]]
    * fallback shape). */
  def searchSq(codes: DataFrame, bounds: DataFrame, queries: DataFrame,
      k: Int, broadcastBytes: Long = 64L << 20,
      idFilter: Option[DataFrame] = None): DataFrame = {
    // restriction BEFORE the n x Q pairing — the scanned row count
    // shrinks with the filtered fraction ([[KnnSearch.restrictIds]])
    val scanCodes = KnnSearch.restrictIds(codes, idFilter)
    val qcodes = encode(queries, bounds, "query_id", "query_vec")
      .select(col("query_id"), col("codes").as("qcodes"))
    val small =
      qcodes.queryExecution.optimizedPlan.stats.sizeInBytes <= broadcastBytes
    val paired =
      if (small) scanCodes.crossJoin(broadcast(qcodes))
      else scanCodes.crossJoin(qcodes.hint("SHUFFLE_REPLICATE_NL"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("id").asc)
    paired
      .withColumn("d2", VectorFunctions.sqL2(col("qcodes"), col("codes")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("d2"), col("rn"))
  }

  /** IVF-SQ8: probe the `nProbe` cosine-nearest coarse cells per query
    * ([[IvfIndex]]-style), then score only their members' codes with the
    * exact integer kernel — the FAISS `IVF…,SQ8` architecture: the
    * scanned fraction drops to nProbe/cells AND each scanned row is 4×
    * smaller. `assignments` is the persisted (id, cell) table from index
    * build; candidates stay narrow (query_id, id) end-to-end and pass
    * the `broadcastBytes` gate. Output (query_id, id, d2, rn) — same
    * exact-BIGINT contract as [[searchSq]]. */
  def searchIvfSq(codes: DataFrame, assignments: DataFrame,
      centroids: DataFrame, bounds: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int, broadcastBytes: Long = 64L << 20,
      idFilter: Option[DataFrame] = None): DataFrame = {
    // probed ranking over the filtered members' cells only
    // ([[IvfIndex.probeCells]] correlated-predicate guard)
    val fasg = KnnSearch.restrictIds(
      assignments.select(col("cell"), col("id")), idFilter)
    val probed = IvfIndex.probeCells(queries, centroids, nProbe,
        idFilter.map(_ => fasg))
      .select(col("query_id"), col("cell"))
    val cand = fasg
      .join(KnnSearch.maybeBroadcast(probed, broadcastBytes), Seq("cell"))
      .select(col("query_id"), col("id"))
    val qcodes = encode(queries, bounds, "query_id", "query_vec")
      .select(col("query_id"), col("codes").as("qcodes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2").asc, col("id").asc)
    codes.join(KnnSearch.maybeBroadcast(cand, broadcastBytes), Seq("id"))
      .join(KnnSearch.maybeBroadcast(qcodes, broadcastBytes), Seq("query_id"))
      .withColumn("d2", VectorFunctions.sqL2(col("qcodes"), col("codes")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("d2"), col("rn"))
  }

  /** SQ shortlist + exact re-rank with the [[KnnSearch.knnExact]] result
    * contract — TRUE-metric similarity + `minSim` floor over the
    * `shortlist` survivors only ([[PqIndex.rerankScored]] tail). Output
    * (query_id, id, score, rn). */
  def searchSqRerankScored(nodes: DataFrame, codes: DataFrame,
      bounds: DataFrame, queries: DataFrame, k: Int, shortlist: Int,
      minSim: Double, metric: String = "cosine",
      broadcastBytes: Long = 64L << 20,
      idFilter: Option[DataFrame] = None): DataFrame = {
    val cand = searchSq(codes, bounds, queries, shortlist, broadcastBytes,
        idFilter)
      .select(col("query_id"), col("id"))
    PqIndex.rerankScored(nodes, cand, queries, k, minSim, metric,
      broadcastBytes)
  }
}
