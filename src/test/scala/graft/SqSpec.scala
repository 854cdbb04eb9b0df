package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnSearch, SqIndex}
import graft.queries.VectorQueries

/** Scalar quantization (SQ8): bounds/code invariants, exact-integer
  * distance determinism, and the shortlist + re-rank quality tail. */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)
  private lazy val queriesDf = VectorQueries.querySet(emb)
  private lazy val bounds = SqIndex.trainBounds(nodesDf)
  private lazy val codes = SqIndex.encode(nodesDf, bounds)

  test("bounds: one row per dimension, lo <= hi") {
    val rows = bounds.collect()
    assert(rows.length === 64)
    assert(rows.map(_.getInt(0)).sorted.toSeq === (0 until 64))
    assert(rows.forall(r => r.getFloat(1) <= r.getFloat(2)))
  }

  test("encode: every vector gets dim codes in [0, 255]; corpus extremes " +
      "hit the range ends") {
    val rows = codes.collect()
    assert(rows.length === nodesDf.count())
    val all = rows.flatMap(_.getSeq[Int](1))
    assert(rows.forall(_.getSeq[Int](1).length == 64))
    assert(all.forall(c => c >= 0 && c <= 255))
    // the dimension minimum codes to 0 and the maximum clamps to 255, so
    // both range ends must actually occur across the corpus
    assert(all.min === 0 && all.max === 255)
  }

  test("codes are partition-invariant (pure column arithmetic)") {
    val a = SqIndex.encode(nodesDf.coalesce(1), bounds).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = SqIndex.encode(nodesDf.repartition(7), bounds).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a === b)
  }

  test("searchSq: corpus-vector queries re-find themselves at d2=0, rank " +
      "honors (d2, id) order") {
    val res = SqIndex.searchSq(codes, bounds, queriesDf, k = 10)
    assert(res.columns.toSeq === Seq("query_id", "id", "d2", "rn"))
    // identical vector → identical codes → exact integer distance 0; the
    // id tiebreak may rank another zero-distance duplicate first, but the
    // self pair must score 0
    val self = res.filter(col("query_id") === col("id"))
      .select("d2").as[Long].collect()
    assert(self.length === queriesDf.count())
    assert(self.forall(_ === 0L))
    // ranks are dense 1..k per query
    val perQ = res.groupBy("query_id").agg(collect_list("rn").as("rns"))
      .select("rns").as[Seq[Int]].collect()
    assert(perQ.forall(_.sorted == (1 to 10)))
  }

  test("constant dimension codes to 0 and contributes 0 distance") {
    val fixed = Seq(
      (1L, Seq(1.0f, 5.0f), false), (2L, Seq(2.0f, 5.0f), false),
      (3L, Seq(3.0f, 5.0f), false))
      .toDF("id", "vector", "deleted")
    val b = SqIndex.trainBounds(fixed)
    val c = SqIndex.encode(fixed, b)
    // dim 1 is constant (hi = lo) → code 0 everywhere
    assert(c.collect().forall(_.getSeq[Int](1)(1) === 0))
    val q = Seq((1L, Seq(1.0f, 5.0f))).toDF("query_id", "query_vec")
    val top = SqIndex.searchSq(c, b, q, k = 3)
      .orderBy("rn").select("id", "d2").as[(Long, Long)].collect().toList
    // only dim 0 separates: codes 0, 128, 255 → d2 = 0, 128², 255²
    assert(top === List((1L, 0L), (2L, 128L * 128L), (3L, 255L * 255L)))
  }

  test("broadcast gate=0 forces the shuffle plan with identical results") {
    val hinted = SqIndex.searchSq(codes, bounds, queriesDf, k = 10)
      .select("query_id", "id", "d2").as[(Long, Long, Long)].collect().toSet
    val shuffled = SqIndex.searchSq(codes, bounds, queriesDf, k = 10,
        broadcastBytes = 0L)
      .select("query_id", "id", "d2").as[(Long, Long, Long)].collect().toSet
    assert(hinted === shuffled)
  }

  test("IVF-SQ: results equal plain SQ restricted to probed cells; full " +
      "probe degrades to plain SQ") {
    import graft.operators.IvfIndex
    val coarse = IvfIndex.sampleCodebook(nodesDf, k = 10)
    val asg = IvfIndex.assign(nodesDf, coarse).select(col("id"), col("cell"))
    val full = SqIndex.searchIvfSq(codes, asg, coarse, bounds, queriesDf,
        k = 10, nProbe = 10)
      .select("query_id", "id", "d2").as[(Long, Long, Long)].collect().toSet
    val plain = SqIndex.searchSq(codes, bounds, queriesDf, k = 10)
      .select("query_id", "id", "d2").as[(Long, Long, Long)].collect().toSet
    assert(full === plain)
    // partial probe returns exactly k rows per query from probed cells only
    val part = SqIndex.searchIvfSq(codes, asg, coarse, bounds, queriesDf,
      k = 10, nProbe = 3)
    assert(part.groupBy("query_id").count().select("count")
      .as[Long].collect().forall(_ === 10L))
  }

  test("shortlist + exact re-rank: knnExact contract, recall clears the " +
      "fixture floor") {
    val res = SqIndex.searchSqRerankScored(nodesDf, codes, bounds,
      queriesDf, k = 10, shortlist = 80, minSim = -2.0)
    assert(res.columns.toSeq === Seq("query_id", "id", "score", "rn"))
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val got = res.select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // SQ8 quantization noise is per-dimension-bounded, so an 80-deep
    // shortlist over 500 vectors recovers most of the exact top-10
    assert(recall >= 0.8, s"recall $recall")
  }
}
