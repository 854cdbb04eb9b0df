package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy maximal-marginal-relevance selection over ONE query's
  * shortlist: from `candidates` (array of (id, sim_micro, vector)
  * structs — the exact-top-`shortlist` rows for the query) pick `k`
  * results maximizing, at each step,
  *
  *   mmr = λ·sim(q, d) − (1 − λ)·max_{s ∈ selected} sim(d, s)
  *
  * — the standard diversified-retrieval re-rank (Carbonell & Goldstein
  * 1998): the first pick is the plain top-1; every later pick trades
  * query relevance against redundancy with what is already selected.
  * The reference engine returns raw similarity order only
  * (`hnsw.ts:241-299`); diversified serving is engine surface a
  * retrieval stack adds directly above it.
  *
  * DETERMINISM (the t09/t36 integer-micro rule): `sim_micro` arrives
  * already quantized (floor(sim·1e6 + 0.5) of the v01-convention
  * double score); each pairwise candidate–selected similarity is
  * computed with the [[CosineSimilarityExpr]] sequential double kernel
  * and quantized the same way at the ONE point a float exists. λ is an
  * integer micro weight, so every mmr score is exact BIGINT arithmetic
  * (|λ·sim| ≤ 1e6·1e6 — no overflow), argmax ties break on id
  * ascending, and the output is independent of the candidate array's
  * order — `collect_list`'s nondeterministic ordering upstream cannot
  * change the result.
  *
  * SCALE: this is a per-QUERY kernel — it runs on Q rows (one per
  * query), never on corpus rows, and each eval is O(k·s·dim) over an
  * s-bounded shortlist, which is why eval-mode (CodegenFallback) is
  * acceptable here where it would not be in a corpus-row hot path
  * (the [[NearestCodeExpr]] rule).
  *
  * Children: (candidates, k, lambdaMicro, metric):
  *  - candidates: ARRAY<STRUCT<id BIGINT, sim_micro BIGINT,
  *    vector ARRAY<FLOAT>>>
  *  - k: foldable INT > 0 — results per query
  *  - lambdaMicro: foldable BIGINT in [0, 1000000]
  *  - metric: foldable STRING, 'cosine' | 'euclidean' (euclidean uses
  *    the 1/(1+dist) similarity transform, `similarity.ts:36-41`, for
  *    the pairwise term — matching what [[KnnSearch.knnExact]] scored
  *    the query side with)
  *
  * Returns ARRAY<STRUCT<rank INT, id BIGINT, sim_micro BIGINT,
  * mmr_micro BIGINT>> in selection order (rank 1-based; rank 1's
  * mmr_micro is λ·sim_micro — no selected set to be redundant with).
  *
  * INPUT HYGIENE (SQL-reachable kernel rules): null slots/fields are
  * dropped; candidates whose pairwise similarity would be undefined
  * (non-finite elements, or zero norm under cosine) are skipped rather
  * than silently quantizing NaN to 0; duplicate-id slots collapse to
  * one candidate (highest sim_micro, ties on the lex-smaller vector)
  * so the greedy never emits the same id at two ranks.
  */
case class MmrSelectExpr(children: Seq[Expression]) extends Expression
    with CodegenFallback {

  override def prettyName: String = "mmr_select"
  override def nullable: Boolean = children.head.nullable

  private val candType = ArrayType(StructType(Seq(
    StructField("id", LongType),
    StructField("sim_micro", LongType),
    StructField("vector", ArrayType(FloatType)))))

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("sim_micro", LongType, nullable = false),
    StructField("mmr_micro", LongType, nullable = false))))

  override def checkInputDataTypes(): TypeCheckResult = {
    def fail(msg: String) = TypeCheckResult.TypeCheckFailure(msg)
    if (children.size != 4)
      return fail("mmr_select(candidates, k, lambda_micro, metric)")
    val okCand = children(0).dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 3 =>
        fs(0).dataType == LongType && fs(1).dataType == LongType &&
          (fs(2).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (!okCand)
      return fail(s"candidates must be $candType, got ${children(0).dataType}")
    if (children(1).dataType != IntegerType || !children(1).foldable)
      return fail("k must be a foldable INT")
    if (children(2).dataType != LongType || !children(2).foldable)
      return fail("lambda_micro must be a foldable BIGINT")
    if (children(3).dataType != StringType || !children(3).foldable)
      return fail("metric must be a foldable STRING")
    val kv = children(1).eval(null)
    if (kv == null || kv.asInstanceOf[Int] <= 0)
      return fail("k must be > 0")
    val lv = children(2).eval(null)
    if (lv == null || lv.asInstanceOf[Long] < 0L ||
        lv.asInstanceOf[Long] > 1000000L)
      return fail("lambda_micro must be in [0, 1000000]")
    val mv = children(3).eval(null)
    if (mv == null || !Set("cosine", "euclidean")
        .contains(mv.asInstanceOf[UTF8String].toString))
      return fail("metric must be 'cosine' or 'euclidean'")
    TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val k: Int =
    children(1).eval(null).asInstanceOf[Int]
  @transient private lazy val lambdaMicro: Long =
    children(2).eval(null).asInstanceOf[Long]
  @transient private lazy val cosineMetric: Boolean =
    children(3).eval(null).asInstanceOf[UTF8String].toString == "cosine"

  /** Pairwise similarity, quantized to micros — the v01 sequential
    * double kernel then floor(x·1e6 + 0.5), bit-matching the oracle's
    * `floor(list_cosine_similarity(...) * 1000000.0 + 0.5)`. */
  private def pairSimMicro(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    val sim =
      if (cosineMetric) {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      } else {
        var s = 0.0; var i = 0
        while (i < n) {
          val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
          s += d * d; i += 1
        }
        1.0 / (1.0 + math.sqrt(s))
      }
    math.floor(sim * 1000000.0 + 0.5).toLong
  }

  /** A candidate whose pairwise term would be UNDEFINED — a non-finite
    * element, or (cosine) a zero norm: its sim to anything is NaN, and
    * `floor(NaN).toLong` would silently quantize to 0 micro ("neutral
    * redundancy"). Unreachable from the operator path (query-side NaN
    * scores are filtered upstream), but the function is SQL-registered
    * — skip such candidates explicitly, mirroring the null-slot rule. */
  private def vectorDefined(v: ArrayData): Boolean = {
    val n = v.numElements()
    var norm = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return false
      val x = v.getFloat(i)
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
        return false
      norm += x.toDouble * x.toDouble
      i += 1
    }
    !cosineMetric || norm > 0.0
  }

  /** Order-free tie-break for duplicate-id slots at EQUAL sim_micro:
    * keep the lexicographically-smaller vector (shorter first, then
    * element-wise float order) so the retained slot never depends on
    * the candidate array's upstream `collect_list` order. */
  private def vecLess(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var i = 0
    while (i < n) {
      val c = java.lang.Float.compare(a.getFloat(i), b.getFloat(i))
      if (c != 0) return c < 0
      i += 1
    }
    na < nb
  }

  override def eval(input: InternalRow): Any = {
    val candsRaw = children(0).eval(input)
    if (candsRaw == null) return null
    val cands = candsRaw.asInstanceOf[ArrayData]
    val total = cands.numElements()
    // drop null elements / null fields / undefined-similarity vectors
    // defensively: the operator path never produces them, but the
    // function is SQL-registered and a hand-built array with a null
    // slot must not read garbage longs (the a30 Slice-overflow lesson:
    // SQL-reachable kernels get the checks the DataFrame path makes
    // unnecessary)
    val ids0 = new Array[Long](total)
    val simQ0 = new Array[Long](total)
    val vecs0 = new Array[ArrayData](total)
    var n = 0
    // duplicate (id) slots collapse to ONE candidate — the greedy must
    // never emit the same id at two ranks ("any (query_id, id, score)
    // relation" is the documented input contract, and an arm that
    // double-emits an id would otherwise double-serve it): keep the
    // highest sim_micro, ties on the lex-smaller vector
    val slotOf = scala.collection.mutable.HashMap.empty[Long, Int]
    var i = 0
    while (i < total) {
      if (!cands.isNullAt(i)) {
        val row = cands.getStruct(i, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2) &&
            vectorDefined(row.getArray(2))) {
          val id = row.getLong(0)
          val sim = row.getLong(1)
          val vec = row.getArray(2)
          slotOf.get(id) match {
            case None =>
              slotOf(id) = n
              ids0(n) = id; simQ0(n) = sim; vecs0(n) = vec
              n += 1
            case Some(j) =>
              if (sim > simQ0(j) ||
                  (sim == simQ0(j) && vecLess(vec, vecs0(j)))) {
                simQ0(j) = sim; vecs0(j) = vec
              }
          }
        }
      }
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val ids = ids0; val simQ = simQ0; val vecs = vecs0
    val taken = new Array[Boolean](n)
    // running max over the selected set of each candidate's pairwise
    // similarity — updated incrementally after each pick, so the whole
    // greedy is O(k·n) pair kernels, not O(k·n·k)
    val maxSel = Array.fill(n)(Long.MinValue)
    val out = new Array[Any](math.min(k, n))
    val oneMinusLambda = 1000000L - lambdaMicro
    var rank = 0
    while (rank < out.length) {
      var best = -1
      var bestScore = Long.MinValue
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          // rank 1 selects on raw relevance (λ = 0 must still return the
          // top hit first, matching the oracle's sel1 ordering); later
          // ranks on the full mmr trade-off
          val score =
            if (rank == 0) simQ(j)
            else lambdaMicro * simQ(j) - oneMinusLambda * maxSel(j)
          if (best == -1 || score > bestScore ||
              (score == bestScore && ids(j) < ids(best))) {
            best = j; bestScore = score
          }
        }
        j += 1
      }
      taken(best) = true
      out(rank) = InternalRow(rank + 1, ids(best), simQ(best),
        if (rank == 0) lambdaMicro * simQ(best) else bestScore)
      // fold the new pick into every remaining candidate's redundancy term
      var m = 0
      while (m < n) {
        if (!taken(m)) {
          val s = pairSimMicro(vecs(m), vecs(best))
          if (s > maxSel(m)) maxSel(m) = s
        }
        m += 1
      }
      rank += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
