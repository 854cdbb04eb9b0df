package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the best k (score desc, id asc) pairs seen.
  * The Spark-native form of the reference's sorted priority queue with
  * eviction beyond a bound (`pqueue.ts:18-24`, `hnsw.ts:367-369,397-399`).
  */
final class TopKBuffer(val k: Int) {
  require(k > 0, s"k must be positive, got $k")
  // parallel arrays, kept sorted: score desc, id asc; size ≤ k
  var n: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  // Double.compare, not primitive >: Spark SQL orders NaN as the LARGEST
  // double (a NaN score outranks everything, as in the window-rank path);
  // primitive NaN comparisons are all-false and would both drop NaNs and
  // corrupt the sorted invariant.
  @inline private def beats(s: Double, id: Long, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && id < ids(i))
  }

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !beats(s, id, n - 1)) return
    var pos = if (n < k) n else n - 1
    while (pos > 0 && beats(s, id, pos - 1)) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** `topk_ids(id, score, k)` — per-group top-k ids by (score desc, id asc),
  * returned as an ordered array. A `TypedImperativeAggregate` with an O(k)
  * bounded buffer: map-side partial aggregation keeps only k candidates per
  * group per partition, so the shuffle carries O(groups × k) rows — the
  * alternative to window row_number ranking when the per-group candidate
  * fan-in is huge (the exact trade the reference makes with its ef-bounded
  * queue).
  */
case class TopKIds(
    idExpr: Expression,
    scoreExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"k must be a literal int, got $other")
  }

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_ids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (idExpr.dataType != LongType)
      TypeCheckFailure(s"topk_ids: id must be BIGINT, got ${idExpr.dataType.simpleString}")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"topk_ids: score must be DOUBLE, got ${scoreExpr.dataType.simpleString}")
    else if (!kExpr.foldable || !Seq[DataType](IntegerType, LongType, ShortType, ByteType).contains(kExpr.dataType))
      TypeCheckFailure("topk_ids: k must be an integer literal")
    else kExpr.eval(InternalRow.empty) match {
      case null => TypeCheckFailure("topk_ids: k must not be null")
      case v =>
        val kv = v match {
          case i: Int => i.toLong; case l: Long => l
          case sh: Short => sh.toLong; case b: Byte => b.toLong
        }
        if (kv <= 0 || kv > Int.MaxValue) // no silent toInt wrap
          TypeCheckFailure(s"topk_ids: k out of range (1..2^31-1), got $kv")
        else TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (id != null && s != null)
      buf.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.ids.take(buf.n))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble(); val id = in.readLong()
      buf.insert(s, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKIds =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKIds =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKIds =
    copy(idExpr = c(0), scoreExpr = c(1), kExpr = c(2))
}

object TopKAggregate {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_ids",
      es => TopKIds(es(0), es(1), es(2)).toAggregateExpression(),
      "built-in")

  /** Column API: per-group ordered array of the top-k ids by score. */
  def topkIds(id: Column, score: Column, k: Int): Column =
    call_function("topk_ids", id, score, org.apache.spark.sql.functions.lit(k))
}
