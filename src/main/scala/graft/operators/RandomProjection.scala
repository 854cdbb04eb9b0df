package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Seeded Johnson–Lindenstrauss random projection: embed `inDim`-dim
  * vectors into `outDim` dims through a deterministic Gaussian matrix
  * (JL lemma: pairwise distances/angles are preserved within ε with
  * outDim = O(log n / ε²) — the standard pre-compression in front of
  * clustering / dedup / ANN when the raw embedding width, not the row
  * count, is the byte bottleneck).
  *
  * Determinism contract ([[IndexBuild.pstableProjections]]'s pattern):
  * the matrix is Box–Muller over a splitmix64 integer mix of
  * (seed, row, dim) — a pure function of the seed, reproducible across
  * JVMs, and inlinable into oracle SQL as exact double literals
  * (Float→Double widening is value-preserving, Double.toString
  * round-trips), so an external engine re-derives every projected value
  * bit-for-bit. Projections are plain dot products against broadcast
  * literals: one narrow map-side pass, no shuffle, whole-stage codegen.
  *
  * No 1/√outDim rescale: cosine (the downstream metric here) is
  * scale-invariant, and callers composing with L2 ops can fold the
  * constant into their own threshold.
  */
object RandomProjection {

  /** Splitmix64-style deterministic pseudo-uniform in [-1, 1]. */
  private def mix(seed: Long, a: Long, b: Long): Double = {
    var z = seed + a * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    z.toDouble / Long.MaxValue.toDouble
  }

  /** The outDim × inDim Gaussian projection matrix for `seed` — exposed
    * so oracle SQL generation can inline the same literals. */
  def gaussians(seed: Long, outDim: Int, inDim: Int): Array[Array[Float]] =
    Array.tabulate(outDim) { p =>
      Array.tabulate(inDim) { j =>
        val u1 = math.max(1e-12, (mix(seed, 2L * p, j) + 1.0) / 2.0)
        val u2 = math.max(1e-12, (mix(seed, 2L * p + 1, j) + 1.0) / 2.0)
        (math.sqrt(-2.0 * math.log(u1))
          * math.cos(2.0 * math.Pi * u2)).toFloat
      }
    }

  private def dots(vecCol: String, seed: Long, outDim: Int, inDim: Int)
      : Seq[Column] =
    gaussians(seed, outDim, inDim).toSeq.map { w =>
      VectorFunctions.dotProduct(col(vecCol), typedLit(w.toSeq))
    }

  /** (id, vector ARRAY<FLOAT> of outDim) — the projected table, shaped
    * for every downstream kernel/operator that consumes `vector`. */
  def project(vecs: DataFrame, seed: Long, outDim: Int, inDim: Int,
      idCol: String = "id", vecCol: String = "vector"): DataFrame =
    vecs.select(col(idCol).as("id"),
      array(dots(vecCol, seed, outDim, inDim).map(_.cast("float")): _*)
        .as("vector"))

  /** (id, proj_micro ARRAY<BIGINT>) — each projected coordinate
    * floor-quantized to integer micros BEFORE any float narrowing, so
    * the column is engine-exact under the repo's quantization rule
    * (floor(x·1e6 + 0.5) on an identically-accumulated double). */
  def projectMicro(vecs: DataFrame, seed: Long, outDim: Int, inDim: Int,
      idCol: String = "id", vecCol: String = "vector"): DataFrame =
    vecs.select(col(idCol).as("id"),
      array(dots(vecCol, seed, outDim, inDim).map(d =>
        floor(d * lit(1000000.0) + lit(0.5)).cast("long")): _*)
        .as("proj_micro"))

  /** JL-compressed search with exact re-rank — the composition the
    * projection exists for: score the FULL table in the `outDim`-dim
    * projected space (64→16 reads 4× fewer bytes per candidate), keep a
    * `shortlist` per query, then re-rank ONLY the survivors with the
    * exact raw-space cosine. Returns (query_id, id, rn) — top-`k` by TRUE
    * similarity among the shortlist. Recall is whatever the projected
    * shortlist catches (JL distortion bounds it); callers pin the floor
    * (RandomProjectionSpec) or the exact per-query overlap (e03).
    *
    * Scale: the projected scan is [[KnnSearch.knnExact]]'s plan (size-gated
    * query broadcast, map-side WindowGroupLimit — shuffle is
    * O(queries × shortlist)); the re-rank re-attaches raw vectors by an id
    * join that touches shortlist rows per query, never the corpus. */
  def searchRerank(nodes: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, seed: Long, outDim: Int, inDim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    val pn = project(live, seed, outDim, inDim)
    val pq = project(queries, seed, outDim, inDim,
        idCol = "query_id", vecCol = "query_vec")
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val short = KnnSearch.knnExact(pn, pq, shortlist, minSim = -2.0)
      .select(col("query_id"), col("id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    short
      .join(live.select(col("id"), col("vector")), Seq("id"))
      .join(KnnSearch.maybeBroadcast(
          queries.select(col("query_id"), col("query_vec")), 64L << 20),
        Seq("query_id"))
      .withColumn("score",
        VectorFunctions.cosineSim(col("query_vec"), col("vector")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("rn"))
  }

  /** Matryoshka prefix-truncation search with exact re-rank (Kusupati
    * et al., NeurIPS 2022): MRL-trained embeddings pack coarse-to-fine
    * signal into dimension PREFIXES, so serving shortlists on the first
    * `dPrefix` dims — dim/dPrefix× fewer bytes and FLOPs per candidate
    * with NO projection matrix at all, the learned-structure
    * counterpart to [[searchRerank]]'s data-oblivious JL planes — then
    * re-ranks the shortlist with the full-dimension exact cosine.
    * Output (query_id, id, rn): top-`k` by TRUE similarity among the
    * shortlist. (The fixture's embeddings are not MRL-trained, so
    * prefix recall is whatever iid dims give — e05 pins the measured
    * per-query overlap; on an MRL checkpoint the same plan serves the
    * paper's quality curve.)
    *
    * Scale: identical plan shape to [[searchRerank]] — truncation is a
    * map-side `slice` (the scan reads dPrefix floats per row), the
    * shortlist is [[KnnSearch.knnExact]]'s size-gated broadcast +
    * WindowGroupLimit, and the re-rank re-attaches raw vectors by an id
    * join touching shortlist rows only, never the corpus. */
  def mrlSearchRerank(nodes: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int, dPrefix: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    require(dPrefix > 0, s"dPrefix $dPrefix")
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    val pn = live.select(col("id"),
      slice(col("vector"), 1, dPrefix).as("vector"))
    val pq = queries.select(col("query_id"),
      slice(col("query_vec"), 1, dPrefix).as("query_vec"))
    val short = KnnSearch.knnExact(pn, pq, shortlist, minSim = -2.0)
      .select(col("query_id"), col("id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    short
      .join(live.select(col("id"), col("vector")), Seq("id"))
      .join(KnnSearch.maybeBroadcast(
          queries.select(col("query_id"), col("query_vec")), 64L << 20),
        Seq("query_id"))
      .withColumn("score",
        VectorFunctions.cosineSim(col("query_vec"), col("vector")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("rn"))
  }

  /** DuckDB expressions for the raw (double) projected coordinates over
    * `vecExpr` (a DOUBLE[] column) — the a08 oracle-inlining pattern.
    * Composed oracles that mirror [[project]]'s ARRAY<FLOAT> output wrap
    * the assembled list in `::FLOAT[]::DOUBLE[]` so the float narrowing
    * happens at the same point as Spark's cast. */
  def dotSqlExprs(vecExpr: String, seed: Long, outDim: Int, inDim: Int)
      : Seq[String] =
    gaussians(seed, outDim, inDim).toSeq.map { w =>
      val arr = w.map(_.toDouble.toString).mkString("[", ", ", "]")
      s"list_dot_product($vecExpr, $arr::DOUBLE[])"
    }

  /** DuckDB expressions for [[projectMicro]]'s array elements over
    * `vecExpr` (a DOUBLE[] column). */
  def microSqlExprs(vecExpr: String, seed: Long, outDim: Int, inDim: Int)
      : Seq[String] =
    dotSqlExprs(vecExpr, seed, outDim, inDim).map { d =>
      s"floor($d * 1000000 + 0.5)::BIGINT"
    }
}
