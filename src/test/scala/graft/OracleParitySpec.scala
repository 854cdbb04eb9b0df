package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Bit-parity of the codegen kernels with the sequential scalar recurrence
  * DuckDB's list kernels implement (list_dot_product /
  * list_cosine_similarity / list_distance accumulate left-to-right in
  * double). Every hash-green ANN oracle rests on this property: if a future
  * kernel edit reorders the accumulation (pairwise/vectorized summation,
  * fused-multiply-add), results stay "correct" numerically but stop
  * bit-matching the oracle — this spec fails FIRST, with a pointed message,
  * instead of 20 driver rows going red. */
class OracleParitySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)
  private val vecs: Seq[(Seq[Float], Seq[Float])] = Seq.fill(64) {
    val dim = 1 + rnd.nextInt(96)
    (Seq.fill(dim)(rnd.nextFloat() * 4f - 2f),
      Seq.fill(dim)(rnd.nextFloat() * 4f - 2f))
  }

  private def seqDot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      s += a(i).toDouble * b(i).toDouble; i += 1
    }
    s
  }
  private def seqCos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  private def seqDist(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    math.sqrt(s)
  }

  private lazy val scored = vecs.toDF("a", "b")
    .select(
      VectorFunctions.dotProduct(col("a"), col("b")).as("dot"),
      VectorFunctions.cosineSim(col("a"), col("b")).as("cos"),
      VectorFunctions.euclideanDist(col("a"), col("b")).as("dist"))
    .as[(Double, Double, Double)].collect()

  test("dot/cosine/euclidean kernels bit-match the sequential recurrence") {
    vecs.zip(scored).foreach { case ((a, b), (dot, cos, dist)) =>
      assert(java.lang.Double.doubleToLongBits(dot) ==
        java.lang.Double.doubleToLongBits(seqDot(a, b)),
        "dot kernel reordered its accumulation — oracle bit-parity broken")
      assert(java.lang.Double.doubleToLongBits(cos) ==
        java.lang.Double.doubleToLongBits(seqCos(a, b)),
        "cosine kernel reordered its accumulation — oracle bit-parity broken")
      assert(java.lang.Double.doubleToLongBits(dist) ==
        java.lang.Double.doubleToLongBits(seqDist(a, b)),
        "distance kernel reordered its accumulation — oracle bit-parity broken")
    }
  }

  test("pq_adc bit-matches the in-sub-order lookup sum") {
    val cases = Seq.fill(32) {
      val m = 1 + rnd.nextInt(8)
      val ksub = 1 + rnd.nextInt(16)
      val codes = Seq.fill(m)(rnd.nextInt(ksub))
      val lut = Seq.fill(m * ksub)(rnd.nextDouble() * 10)
      (codes, lut, ksub)
    }
    val got = cases.map { case (c, l, _) => (c, l) }.toDF("codes", "lut")
      .select(VectorFunctions.pqAdc(col("codes"), col("lut")).as("adc"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((codes, lut, ksub), adc) =>
      var s = 0.0
      codes.zipWithIndex.foreach { case (c, i) => s += lut(i * ksub + c) }
      assert(java.lang.Double.doubleToLongBits(adc) ==
        java.lang.Double.doubleToLongBits(s),
        "pq_adc reordered its lookup sum — oracle bit-parity broken")
    }
  }

  test("pq_adc surfaces out-of-range CODES as +Inf, even when the flat index lands in bounds") {
    // code -1 at sub 1 flattens to ksub-1 (in bounds → would silently
    // read sub 0's LUT block); code == ksub at sub 0 flattens to ksub
    // (sub 1's first entry). Both must poison the sum, not mis-read.
    val ksub = 4
    val lut = (0 until 2 * ksub).map(_.toDouble)
    val rows = Seq(
      (Seq(0, -1), lut),       // -1 at inner sub: flat idx = ksub - 1
      (Seq(ksub, 0), lut),     // ksub at sub 0: flat idx = ksub
      (Seq(0, 1), lut))        // control: valid codes
    val got = rows.toDF("codes", "lut")
      .select(VectorFunctions.pqAdc(col("codes"), col("lut")).as("adc"))
      .as[Double].collect()
    assert(got(0).isPosInfinity, s"negative code not poisoned: ${got(0)}")
    assert(got(1).isPosInfinity, s"code==ksub not poisoned: ${got(1)}")
    assert(got(2) == lut(0) + lut(ksub + 1))
  }
}
