package graft

import org.apache.spark.sql.functions._
import graft.operators.OpqRotation
import graft.queries.VectorQueries

/** Parametric OPQ rotation: orthogonality, metric preservation,
  * determinism, and the eigensolver it rests on. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)

  test("jacobiEigen solves a symmetric matrix: A v = lambda v and " +
      "V is orthonormal") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, 0.1),
      Array(0.5, 0.25, 2.0, 0.0),
      Array(0.0, 0.1, 0.0, 1.0))
    val (vals, vecs) = OpqRotation.jacobiEigen(a)
    val d = a.length
    for (c <- 0 until d) {
      val v = Array.tabulate(d)(r => vecs(r)(c))
      val av = Array.tabulate(d)(r =>
        (0 until d).map(k => a(r)(k) * v(k)).sum)
      for (r <- 0 until d)
        assert(math.abs(av(r) - vals(c) * v(r)) < 1e-9,
          s"A v != lambda v at ($r,$c)")
    }
    for (c1 <- 0 until d; c2 <- c1 until d) {
      val dot = (0 until d).map(r => vecs(r)(c1) * vecs(r)(c2)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9)
    }
    // trace is preserved by similarity transforms
    assert(math.abs(vals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9)
  }

  test("trainRotation yields an orthogonal matrix (R R^T = I) and is " +
      "deterministic") {
    val r1 = OpqRotation.trainRotation(nodesDf, m = 8)
    val r2 = OpqRotation.trainRotation(nodesDf, m = 8)
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
    val d = r1.length
    assert(r1.forall(_.length == d))
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d)
        .map(k => r1(i)(k).toDouble * r1(j)(k).toDouble).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-5,
        s"R R^T deviates at ($i,$j): $dot")
    }
  }

  test("rotate preserves pairwise euclidean distance and cosine within " +
      "float tolerance, and passes non-vector columns through") {
    val rot = OpqRotation.trainRotation(nodesDf, m = 8)
    val rotated = OpqRotation.rotate(nodesDf, rot)
    assert(rotated.columns.toSeq === nodesDf.columns.toSeq)
    val before = nodesDf.select(col("id"), col("vector"))
      .as[(Long, Seq[Float])].collect().toMap
    val after = rotated.select(col("id"), col("vector"))
      .as[(Long, Seq[Float])].collect().toMap
    def l2(a: Seq[Float], b: Seq[Float]) = math.sqrt(
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val ids = before.keys.toSeq.sorted.take(30)
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      assert(math.abs(l2(before(a), before(b)) - l2(after(a), after(b)))
        < 1e-3)
      assert(math.abs(cos(before(a), before(b)) - cos(after(a), after(b)))
        < 1e-3)
    }
  }

  test("allocateRotation deals eigendirections so per-subspace variance " +
      "products balance (no subspace hoards the top eigenvalues)") {
    // synthetic spectrum: strongly decaying eigenvalues, identity basis
    val d = 8
    val vals = Array(64.0, 32.0, 16.0, 8.0, 4.0, 2.0, 1.0, 0.5)
    val vecs = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val r = OpqRotation.allocateRotation(vals, vecs, m = 2)
    // rows are permuted unit vectors; recover each bucket's eigenvalues
    def bucketVals(rows: Array[Array[Double]]) =
      rows.map(row => vals(row.indexWhere(_ == 1.0)))
    val b0 = bucketVals(r.slice(0, 4)).map(math.log).sum
    val b1 = bucketVals(r.slice(4, 8)).map(math.log).sum
    // greedy on this spectrum lands within one step of perfect balance
    assert(math.abs(b0 - b1) <= math.log(2.0) + 1e-9,
      s"log-products $b0 vs $b1")
  }
}
