package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, coalesce, lit}
import org.apache.spark.sql.types._

/** Similarity kernels over `ArrayType(FloatType)` vectors, as native
  * Catalyst expressions with whole-stage-codegen bodies (a tight primitive
  * loop; no per-row allocation). Semantics follow the reference kernels in
  * `similarity.ts:2-41` (dot product, cosine, euclidean distance,
  * euclidean similarity = 1/(1+dist)), generalized to batch columns.
  *
  * All arithmetic accumulates in Double, sequentially over elements — the
  * same evaluation order as the reference's scalar JS loops and as DuckDB's
  * sequential list kernels, which makes results bit-reproducible across the
  * oracle boundary.
  */
abstract class VectorKernel extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  /** Java source for the loop body: given array vars `a`,`b`, assign the
    * result to `res` (a declared double). Every local MUST come from
    * `fresh` — two instances of one kernel can inline into the same
    * generated function, and fixed names would collide and silently drop
    * the whole stage back to interpreted eval. */
  protected def loopCode(a: String, b: String, res: String,
      fresh: String => String): String
  protected def evalKernel(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    evalKernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res")
      s"""
         |double $res = 0.0;
         |${loopCode(a, b, res, ctx.freshName)}
         |${ev.value} = $res;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — reference `similarity.ts:2-11`. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorKernel {
  override def prettyName: String = "dot_product"
  protected def loopCode(a: String, b: String, res: String,
      fresh: String => String): String = {
    val n = fresh("n"); val i = fresh("i")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |for (int $i = 0; $i < $n; $i++) {
       |  $res += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
       |}
     """.stripMargin
  }
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** dot/(‖a‖·‖b‖) — reference `similarity.ts:13-23` (one fused pass). */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends VectorKernel {
  override def prettyName: String = "cosine_sim"
  protected def loopCode(a: String, b: String, res: String,
      fresh: String => String): String = {
    val n = fresh("n"); val i = fresh("i")
    val dot = fresh("dot"); val na = fresh("na"); val nb = fresh("nb")
    val x = fresh("x"); val y = fresh("y")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $dot = 0.0, $na = 0.0, $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double) $a.getFloat($i);
       |  double $y = (double) $b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$res = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** √Σ(aᵢ−bᵢ)² — reference `similarity.ts:25-34`. */
case class EuclideanDistanceExpr(left: Expression, right: Expression)
    extends VectorKernel {
  override def prettyName: String = "euclidean_dist"
  protected def loopCode(a: String, b: String, res: String,
      fresh: String => String): String = {
    val n = fresh("n"); val i = fresh("i")
    val acc = fresh("acc"); val d = fresh("d")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
       |  $acc += $d * $d;
       |}
       |$res = java.lang.Math.sqrt($acc);
     """.stripMargin
  }
  protected def evalKernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Scalar-quantization squared-L2 kernel over two int-code arrays
  * (symmetric SQ distance): Σ (a_i − b_i)², accumulated in index order in
  * BIGINT — EXACT integer arithmetic, so the value is bit-identical on any
  * engine and any partitioning (8-bit codes over ≤ 2^41 dims cannot
  * overflow a long). Mismatched lengths return Long.MaxValue — corrupt
  * pairings surface as never-top-ranked, the [[PqAdcExpr]] rule. */
case class SqL2Expr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "sq_l2"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<INT>, ARRAY<INT>), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) Long.MaxValue
    else {
      var s = 0L; var i = 0
      while (i < n) {
        val d = (a.getInt(i) - b.getInt(i)).toLong
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res"); val n = ctx.freshName("n")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |long $res = Long.MAX_VALUE;
         |int $n = $a.numElements();
         |if ($n == $b.numElements()) {
         |  $res = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = (long) ($a.getInt($i) - $b.getInt($i));
         |    $res += $d * $d;
         |  }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Hamming-distance kernel over two packed bit-sign arrays (ARRAY<BIGINT>
  * of 32-bit words): Σ popcount(a_i XOR b_i) — exact integer arithmetic,
  * bit-identical on any engine/partitioning ([[SqL2Expr]] contract).
  * Mismatched lengths return Long.MaxValue (never-top-ranked). */
case class HammingExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "hamming64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) Long.MaxValue
    else {
      var s = 0L; var i = 0
      while (i < n) {
        s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("res"); val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |long $res = Long.MAX_VALUE;
         |int $n = $a.numElements();
         |if ($n == $b.numElements()) {
         |  $res = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $res += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance kernel: `left` = the m sub-codes of one vector
  * (ARRAY<INT>), `right` = one query's flattened distance LUT
  * (ARRAY<DOUBLE>, laid out [sub*ksub + code]; ksub derived per row as
  * lutLen / m). Result = Σ_s lut[s*ksub + code_s], accumulated in sub
  * order 0..m−1 — a FIXED per-row summation order, so the value is
  * independent of partitioning and reproducible by any engine that sums
  * the per-sub distances in sub order (the oracle's ordered list_reduce).
  * Out-of-range codes contribute +∞, surfacing corrupt inputs as
  * never-top-ranked rather than wrong-but-plausible. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (ARRAY<INT>, ARRAY<DOUBLE>), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) 0.0
    else {
      val ksub = lut.numElements() / m
      var s = 0.0; var i = 0
      while (i < m) {
        // validate the CODE, not the flattened index: a negative or
        // >= ksub code at an inner sub can still land inside [0, lutLen)
        // and silently read an adjacent sub's LUT block — corruption must
        // surface as +Inf, never as a plausible distance
        val code = codes.getInt(i)
        s += (if (code >= 0 && code < ksub) lut.getDouble(i * ksub + code)
              else Double.PositiveInfinity)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val res = ctx.freshName("res"); val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub"); val i = ctx.freshName("i")
      val code = ctx.freshName("code")
      s"""
         |double $res = 0.0;
         |int $m = $c.numElements();
         |if ($m > 0) {
         |  int $ksub = $l.numElements() / $m;
         |  for (int $i = 0; $i < $m; $i++) {
         |    int $code = $c.getInt($i);
         |    $res += ($code >= 0 && $code < $ksub)
         |      ? $l.getDouble($i * $ksub + $code) : Double.POSITIVE_INFINITY;
         |  }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column wrappers + SQL registration. Queries call [[VectorFunctions.register]]
  * once per session (idempotent) and then use either the `Column` API here or
  * `expr("cosine_sim(a,b)")` in SQL text.
  */
object VectorFunctions {
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (es => DotProductExpr(es(0), es(1))),
    "cosine_sim" -> (es => CosineSimilarityExpr(es(0), es(1))),
    "euclidean_dist" -> (es => EuclideanDistanceExpr(es(0), es(1))),
    "pq_adc" -> (es => PqAdcExpr(es(0), es(1))),
    "sq_l2" -> (es => SqL2Expr(es(0), es(1))),
    "hamming64" -> (es => HammingExpr(es(0), es(1))),
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  def dotProduct(a: Column, b: Column): Column = call_function("dot_product", a, b)
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** Reference null semantics: cosine of a missing vector is −1
    * (`similarity.ts:17`) rather than SQL NULL. */
  def cosineSimOrNeg1(a: Column, b: Column): Column =
    coalesce(cosineSim(a, b), lit(-1.0))
  def euclideanDist(a: Column, b: Column): Column =
    call_function("euclidean_dist", a, b)

  /** 1/(1+dist) distance→similarity transform — `similarity.ts:36-41`. */
  def euclideanSim(a: Column, b: Column): Column =
    lit(1.0) / (lit(1.0) + euclideanDist(a, b))

  /** PQ ADC lookup-sum over (codes ARRAY<INT>, flat LUT ARRAY<DOUBLE>). */
  def pqAdc(codes: Column, lut: Column): Column =
    call_function("pq_adc", codes, lut)

  /** Symmetric SQ squared-L2 over two ARRAY<INT> code rows (exact BIGINT). */
  def sqL2(a: Column, b: Column): Column = call_function("sq_l2", a, b)

  /** Hamming distance over two packed ARRAY<BIGINT> sign-bit rows. */
  def hamming64(a: Column, b: Column): Column =
    call_function("hamming64", a, b)
}
