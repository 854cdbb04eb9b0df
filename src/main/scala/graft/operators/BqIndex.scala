package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Binary quantization (1-bit sign codes + Hamming ranking) — the extreme
  * point of the compression ladder ([[SqIndex]] 4×, [[PqIndex]] 32×, this
  * 32× for float32 at one bit per dimension with a trivial build): each
  * dimension maps to one bit, x > midpoint(lo, hi), packed 32 bits per
  * BIGINT word; search ranks by Hamming distance — popcount of XOR over
  * the packed words via the codegen'd [[graft.functions.HammingExpr]]
  * kernel. Like SQ8 the whole score path is EXACT integer arithmetic
  * (bit-identical on any engine/partitioning), and the usual quality tail
  * applies: Hamming shortlist → exact re-rank.
  *
  * 32-bit words (not 64) are deliberate: `1::BIGINT << 63` overflows
  * engines with checked shifts (DuckDB) while the JVM wraps — capping the
  * shift at 31 keeps every word value positive and the packing arithmetic
  * portable everywhere.
  *
  * Spark shape: bounds broadcast (dim-sized); encode is posexplode →
  * sign bit → `bit_or` word assembly, map-side collapsible; search
  * crossJoins packed words against the size-gated broadcast query words —
  * the exact-kNN shuffle class over rows 32× smaller than float32.
  */
object BqIndex {

  /** Sign bit per (row, pos): x strictly above the midpoint of the
    * corpus [lo, hi] for that dimension. Constant dimensions (hi = lo)
    * code to 0. Midpoint arithmetic runs in DOUBLE with mirrored
    * parenthesization — the [[SqIndex]] portability rule. */
  private def bitOf(x: Column, lo: Column, hi: Column): Column =
    when(x.cast("double") >
        (lo.cast("double") + hi.cast("double")) / lit(2.0),
      expr("shiftleft(1L, cast(pmod(pos, 32) as int))"))
      .otherwise(lit(0L))

  /** Encode against [[SqIndex.trainBounds]] bounds → (id, bits
    * ARRAY<BIGINT> of ⌈dim/32⌉ words ordered by word index). */
  def encode(df: DataFrame, bounds: DataFrame, idCol: String = "id",
      vecCol: String = "vector"): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .join(broadcast(bounds), Seq("pos"))
      .select(col(idCol), expr("CAST(pos div 32 AS INT)").as("word"),
        bitOf(col("x"), col("lo"), col("hi")).as("b"))
      .groupBy(col(idCol), col("word"))
      .agg(expr("bit_or(b)").as("w"))
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("word"), col("w")))),
        e => e.getField("w")).as("bits"))

  /** Hamming top-k: encode the queries with the corpus bounds, rank by
    * exact popcount-of-XOR (asc, ties id asc). Output
    * (query_id, id, hd BIGINT, rn) — hd is exact, engine-portable. The
    * query-bit table broadcasts while it fits `broadcastBytes`; past
    * that both sides stay partitioned (SHUFFLE_REPLICATE_NL). */
  def searchBq(bits: DataFrame, bounds: DataFrame, queries: DataFrame,
      k: Int, broadcastBytes: Long = 64L << 20,
      idFilter: Option[DataFrame] = None): DataFrame = {
    // restriction BEFORE the n x Q pairing ([[KnnSearch.restrictIds]])
    val scanBits = KnnSearch.restrictIds(bits, idFilter)
    val qbits = encode(queries, bounds, "query_id", "query_vec")
      .select(col("query_id"), col("bits").as("qbits"))
    val small =
      qbits.queryExecution.optimizedPlan.stats.sizeInBytes <= broadcastBytes
    val paired =
      if (small) scanBits.crossJoin(broadcast(qbits))
      else scanBits.crossJoin(qbits.hint("SHUFFLE_REPLICATE_NL"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hd").asc, col("id").asc)
    paired
      .withColumn("hd", VectorFunctions.hamming64(col("qbits"), col("bits")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("hd"), col("rn"))
  }

  /** IVF-BQ: probe the `nProbe` cosine-nearest coarse cells per query
    * ([[IvfIndex]]-style), then Hamming-rank only their members' packed
    * words — completing the coarse-quantizer × compression matrix
    * ([[PqIndex]] IVF-PQ/residual, [[SqIndex]] IVF-SQ8, this): the
    * scanned fraction drops to nProbe/cells AND each scanned row is 32×
    * smaller than float32. `assignments` is the persisted (id, cell)
    * table from index build; candidates stay narrow (query_id, id) and
    * every query-proportional table passes the `broadcastBytes` gate.
    * Output (query_id, id, hd, rn) — the [[searchBq]] exact-BIGINT
    * contract. */
  def searchIvfBq(bits: DataFrame, assignments: DataFrame,
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
    val qbits = encode(queries, bounds, "query_id", "query_vec")
      .select(col("query_id"), col("bits").as("qbits"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hd").asc, col("id").asc)
    bits.join(KnnSearch.maybeBroadcast(cand, broadcastBytes), Seq("id"))
      .join(KnnSearch.maybeBroadcast(qbits, broadcastBytes), Seq("query_id"))
      .withColumn("hd", VectorFunctions.hamming64(col("qbits"), col("bits")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("hd"), col("rn"))
  }

  /** Exact Hamming-ball near-duplicate pairs via multi-index hashing
    * (Norouzi, Punjani & Fleet, "Fast Search in Hamming Space with
    * Multi-Index Hashing", CVPR 2012): slice each packed code row into
    * exactly `maxHd + 1` equal byte-aligned bands; by pigeonhole, ANY
    * pair with hd ≤ maxHd differs in fewer bits than there are bands,
    * so it shares at least one identical band, and an equi-join on
    * (band index, band value) generates EVERY qualifying candidate —
    * exact recall inside the ball, the [[TextDedup]]
    * deletion-neighborhood guarantee transplanted to embedding space —
    * and the Hamming verify then keeps pairs with hd ≤ `maxHd`.
    * The integer-exact, 32×-compressed complement to the probabilistic
    * LSH-cosine near-dup pairs (d06): candidates are banded (never
    * all-pairs), verification reads 8-byte code rows, and every value
    * in the output is exact integer arithmetic. Output
    * (a_id, b_id, hd), a_id < b_id. */
  def hammingNearDupPairs(bits: DataFrame, maxHd: Int): DataFrame = {
    val words = bits.select(max(size(col("bits")))).head().getInt(0)
    val nBytes = 4 * words
    val nBands = maxHd + 1
    require(maxHd < nBytes,
      s"maxHd $maxHd breaks the pigeonhole guarantee: $words words give " +
        s"$nBytes byte-granularity bands, exact only for hd <= ${nBytes - 1}")
    require(nBytes % nBands == 0,
      s"code bytes $nBytes must divide into ${nBands} bands " +
        s"(= maxHd + 1) — pad the code or pick maxHd accordingly")
    // exactly maxHd+1 bands of g bytes each: pigeonhole needs only that
    // many, and WIDER bands mean a bigger bucket space — for long codes
    // the collision rate of unrelated rows falls off exponentially with
    // g, which is what keeps the candidate join sub-quadratic at scale
    // (the g=1 floor forced by 64-bit codes at hd<=7 caps the space at
    // 256 values — fine when near-dup mass dominates buckets, hazardous
    // for huge uniform corpora; use longer codes). The band VALUE is
    // xxhash64 over the band's (position, byte) structs, not arithmetic
    // shift-packing: equal bands still hash equal (recall stays exact),
    // unequal bands get a full 64-bit space at ANY g — shift-packing
    // wraps the shift amount past the integer width (g > 4 on INT
    // lanes), silently aliasing distant bytes onto the same bits.
    val g = nBytes / nBands
    val banded = bits
      .select(col("id"), col("bits"),
        explode(sequence(lit(0), lit(nBytes - 1))).as("byte"))
      .select(col("id"), col("byte"),
        expr("shiftright(element_at(bits, CAST(byte div 4 AS INT) + 1), " +
          "8 * CAST(pmod(byte, 4) AS INT)) & 255").as("bv"))
      .groupBy(col("id"), expr(s"CAST(byte div $g AS INT)").as("band"))
      .agg(xxhash64(array_sort(collect_list(struct(col("byte"), col("bv")))))
        .as("bval"))
    val cand = banded.select(col("band"), col("bval"), col("id").as("a_id"))
      .join(banded.select(col("band"), col("bval"), col("id").as("b_id")),
        Seq("band", "bval"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(bits.select(col("id").as("a_id"), col("bits").as("a_bits")),
        Seq("a_id"))
      .join(bits.select(col("id").as("b_id"), col("bits").as("b_bits")),
        Seq("b_id"))
      .withColumn("hd", VectorFunctions.hamming64(col("a_bits"), col("b_bits")))
      .filter(col("hd") <= maxHd)
      .select(col("a_id"), col("b_id"), col("hd"))
  }

  /** Hamming shortlist + exact re-rank with the [[KnnSearch.knnExact]]
    * result contract ([[PqIndex.rerankScored]] tail). Output
    * (query_id, id, score, rn). */
  def searchBqRerankScored(nodes: DataFrame, bits: DataFrame,
      bounds: DataFrame, queries: DataFrame, k: Int, shortlist: Int,
      minSim: Double, metric: String = "cosine",
      broadcastBytes: Long = 64L << 20,
      idFilter: Option[DataFrame] = None): DataFrame = {
    val cand = searchBq(bits, bounds, queries, shortlist, broadcastBytes,
        idFilter)
      .select(col("query_id"), col("id"))
    PqIndex.rerankScored(nodes, cand, queries, k, minSim, metric,
      broadcastBytes)
  }
}
