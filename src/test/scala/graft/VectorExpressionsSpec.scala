package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Kernels vs hand-computed values, incl. the reference's edge semantics
  * (similarity.ts): euclideanSim = 1/(1+dist), cosine null → −1 via the
  * OrNeg1 wrapper, zero-norm → NaN. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def row(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("dot product matches hand computation") {
    val d = row(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(dotProduct($"a", $"b")).head.getDouble(0)
    assert(d === 32.0)
  }

  test("cosine of identical unit vectors is 1; orthogonal is 0") {
    assert(row(Seq(1f, 0f), Seq(1f, 0f))
      .select(cosineSim($"a", $"b")).head.getDouble(0) === 1.0)
    assert(row(Seq(1f, 0f), Seq(0f, 1f))
      .select(cosineSim($"a", $"b")).head.getDouble(0) === 0.0)
  }

  test("cosine general value") {
    // cos((1,2,3),(4,5,6)) = 32 / (sqrt(14)*sqrt(77))
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    val got = row(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))
      .select(cosineSim($"a", $"b")).head.getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("euclidean distance and similarity (1/(1+d), similarity.ts:36-41)") {
    val df = row(Seq(0f, 0f), Seq(3f, 4f))
    assert(df.select(euclideanDist($"a", $"b")).head.getDouble(0) === 5.0)
    assert(df.select(euclideanSim($"a", $"b")).head.getDouble(0) === 1.0 / 6.0)
  }

  test("null vector: standard null propagation; OrNeg1 restores -1 compat") {
    val df = Seq((Some(Seq(1f, 0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    assert(df.select(cosineSim($"a", $"b")).head.isNullAt(0))
    assert(df.select(cosineSimOrNeg1($"a", $"b")).head.getDouble(0) === -1.0)
  }

  test("zero-norm vector yields NaN (reference divides by zero likewise)") {
    val got = row(Seq(0f, 0f), Seq(1f, 0f))
      .select(cosineSim($"a", $"b")).head.getDouble(0)
    assert(got.isNaN)
  }

  test("interpreted eval matches codegen result") {
    val df = row(Seq(0.1f, 0.2f, 0.7f), Seq(0.3f, 0.4f, 0.3f))
    val viaCodegen = df.select(cosineSim($"a", $"b")).head.getDouble(0)
    val a = Seq(0.1f, 0.2f, 0.7f); val b = Seq(0.3f, 0.4f, 0.3f)
    val (dot, na, nb) = a.zip(b).foldLeft((0.0, 0.0, 0.0)) {
      case ((d, x, y), (p, q)) =>
        (d + p.toDouble * q.toDouble, x + p.toDouble * p.toDouble,
          y + q.toDouble * q.toDouble)
    }
    assert(viaCodegen === dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  test("SQL registration: expr('cosine_sim(a,b)') works") {
    val got = row(Seq(1f, 0f), Seq(1f, 0f))
      .selectExpr("cosine_sim(a, b) AS c").head.getDouble(0)
    assert(got === 1.0)
  }

  test("type check rejects non-float arrays") {
    val err = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
        .select(expr("cosine_sim(a, b)")).head
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }

  test("top_cells SQL literals are shape-checked at analysis time: " +
      "negative p and mistyped cents fail loudly, not in codegen") {
    val df = Seq(Tuple1(Seq(1f, 0f))).toDF("v")
    // negative p: would allocate new double[take] with take < 0 inside
    // generated code — must be an analysis error instead
    val e1 = intercept[Exception] {
      df.selectExpr(
        "top_cells(v, array(array(1.0f, 0.0f)), array(0), -1)").head
    }
    assert(e1.getMessage.contains("non-negative"))
    // mistyped cents (double arrays): ClassCastException in codegen
    // before the check
    val e2 = intercept[Exception] {
      df.selectExpr(
        "top_cells(v, array(array(1.0d, 0.0d)), array(0), 1)").head
    }
    assert(e2.getMessage.contains("ARRAY"))
    // well-typed call still serves
    val ok = df.selectExpr(
      "top_cells(v, array(array(1.0f, 0.0f), array(0.0f, 1.0f)), " +
        "array(7, 9), 1)").head.getSeq[Int](0)
    assert(ok === Seq(7))
  }

  test("nearest_code SQL literals are shape-checked at analysis time") {
    val df = Seq((0, Seq(1f, 0f))).toDF("s", "v")
    val e = intercept[Exception] {
      // ids as strings: must fail analysis, not cast inside codegen
      df.selectExpr("nearest_code(s, v, array(array(array(1.0f, 0.0f))), " +
        "array(array('x')), 'euclidean')").head
    }
    assert(e.getMessage.contains("ARRAY"))
    val ok = df.selectExpr(
      "nearest_code(s, v, array(array(array(0.0f, 1.0f), " +
        "array(1.0f, 0.0f))), array(array(4, 6)), 'euclidean')")
      .head.getInt(0)
    assert(ok === 6)
  }
}
