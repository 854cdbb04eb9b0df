package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Parametric OPQ rotation (Ge et al., "Optimized Product Quantization
  * for Approximate Nearest Neighbor Search", CVPR 2013, §4 — the
  * non-iterative PCA solution): rotate the space so principal directions
  * spread across the PQ subspaces with balanced variance products
  * ("eigenvalue allocation"), then product-quantize as usual. An
  * orthogonal rotation preserves L2 and cosine exactly, so search
  * SEMANTICS are unchanged — only the subspace split the codebooks see,
  * which is precisely PQ's blind spot when the data's covariance is
  * anisotropic or correlated across the fixed coordinate split.
  *
  * Scale shape: the covariance estimate collects a BOUNDED deterministic
  * sample (lowest-id rows, the [[PqIndex.sampleCodebooks]] bootstrap
  * rule) and all d×d math (Jacobi eigensolve, allocation) runs on the
  * driver — constant work at any corpus size. Applying the rotation is
  * `dim` dot products against literal matrix rows: one map-side
  * whole-stage-codegen pass, zero shuffle (the
  * [[RandomProjection.project]] pattern at square shape).
  */
object OpqRotation {

  /** Centered covariance of the sample rows (d×d, driver-side). */
  private[graft] def covarianceOf(sample: Array[Array[Double]])
      : Array[Array[Double]] = {
    val n = sample.length
    require(n > 1, s"need >1 sample rows, got $n")
    val d = sample(0).length
    val mean = Array.tabulate(d)(j => sample.map(_(j)).sum / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        var acc = 0.0
        var r = 0
        while (r < n) {
          acc += (sample(r)(i) - mean(i)) * (sample(r)(j) - mean(j))
          r += 1
        }
        cov(i)(j) = acc / (n - 1)
        cov(j)(i) = cov(i)(j)
        j += 1
      }
      i += 1
    }
    cov
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvectors as COLUMNS of V) with A·V = V·diag(λ).
    * Deterministic (fixed sweep order, fixed tolerance); plenty for
    * d ≤ a few hundred — the embedding widths PQ sees. */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            // 2x2 symmetric Schur rotation (Golub & Van Loan 8.4)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frobenius(a: Array[Array[Double]]): Double =
    math.sqrt(a.map(_.map(x => x * x).sum).sum)

  /** Eigenvalue allocation (Ge et al. §4.2): greedily deal eigenvectors
    * (λ descending) to the subspace bucket with the smallest current
    * log-variance product (ties: lowest bucket) until each holds
    * `subLen`; the rotation's ROWS are the allocated eigenvectors, bucket
    * by bucket, so subspace b of the rotated vector spans bucket b's
    * directions and the per-subspace variance products balance — the
    * free-parameter choice that minimizes the parametric quantization
    * bound. Deterministic: ties in λ break by original index. */
  private[graft] def allocateRotation(vals: Array[Double],
      vecs: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    val d = vals.length
    require(d % m == 0, s"dim $d not divisible by $m subspaces")
    val subLen = d / m
    val order = vals.indices.sortBy(i => (-vals(i), i))
    val logp = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(List.empty[Int])
    for (i <- order) {
      val b = (0 until m)
        .filter(buckets(_).length < subLen)
        .minBy(b => (logp(b), b))
      buckets(b) = buckets(b) :+ i
      // guard λ ≤ 0 (numerical zeros of a low-rank covariance)
      logp(b) += math.log(math.max(vals(i), 1e-12))
    }
    // row r of R = eigenvector COLUMN buckets(r/subLen)(r%subLen) of V
    buckets.flatten.map(ci => vecs.map(_(ci))).toArray
  }

  /** Train the rotation from a bounded deterministic sample of the live
    * vectors: covariance → Jacobi eigensolve → eigenvalue allocation.
    * Returns the orthogonal d×d rotation as Float rows (value-preserving
    * when widened back — the literal-inlining contract every seeded
    * matrix here follows). */
  def trainRotation(nodes: DataFrame, m: Int, sampleSize: Int = 8192,
      idCol: String = "id", vecCol: String = "vector")
      : Array[Array[Float]] = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    val sample = live.orderBy(col(idCol).asc).limit(sampleSize)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val (vals, vecs) = jacobiEigen(covarianceOf(sample))
    allocateRotation(vals, vecs, m).map(_.map(_.toFloat))
  }

  /** Apply the rotation map-side: replace `vecCol` with R·v (float,
    * `dim` literal-row dot products inside whole-stage codegen; all other
    * columns pass through). */
  def rotate(df: DataFrame, rot: Array[Array[Float]],
      vecCol: String = "vector"): DataFrame =
    // ONE mat-vec kernel, not dim separate dot-product expressions: the
    // array-of-dots projection generates dim kernel bodies and at
    // dim = 384 the stage degrades to interpreted eval (25+ min for the
    // 200 k rotation, vs seconds — [[graft.functions.MatVecExpr]]).
    // Arithmetic is element-for-element identical (double accumulation
    // in index order, float cast per output).
    df.withColumn(vecCol,
      VectorFunctions.matVec(col(vecCol), rot.toSeq.map(_.toSeq)))
}
