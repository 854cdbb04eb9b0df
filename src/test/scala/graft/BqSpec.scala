package graft

import org.apache.spark.sql.functions._
import graft.operators.{BqIndex, IvfIndex, KnnSearch, SqIndex}
import graft.queries.VectorQueries

/** Binary quantization: packing invariants, exact-integer Hamming
  * determinism, and the shortlist + re-rank quality tail. */
class BqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)
  private lazy val queriesDf = VectorQueries.querySet(emb)
  private lazy val bounds = SqIndex.trainBounds(nodesDf)
  private lazy val bits = BqIndex.encode(nodesDf, bounds)

  test("encode: ceil(dim/32) words per vector, bits only inside the dim " +
      "range") {
    val rows = bits.collect()
    assert(rows.length === nodesDf.count())
    // dim 64 → exactly 2 words, every word uses only the low 32 bits
    assert(rows.forall(_.getSeq[Long](1).length == 2))
    assert(rows.forall(_.getSeq[Long](1).forall(w =>
      w >= 0L && w <= 0xFFFFFFFFL)))
  }

  test("hand-computed packing: known vectors, known bounds") {
    val fixed = Seq(
      (1L, Seq(0.0f, 10.0f, 0.0f), false),
      (2L, Seq(10.0f, 0.0f, 10.0f), false))
      .toDF("id", "vector", "deleted")
    val b = SqIndex.trainBounds(fixed)
    // midpoints are 5.0 per dim: row 1 → bits 010 → word 2; row 2 →
    // bits 101 → word 5
    val w = BqIndex.encode(fixed, b).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(w(1L) === Seq(2L))
    assert(w(2L) === Seq(5L))
    // Hamming between them = 3 (all dims differ)
    val q = Seq((1L, Seq(0.0f, 10.0f, 0.0f))).toDF("query_id", "query_vec")
    val top = BqIndex.searchBq(BqIndex.encode(fixed, b), b, q, k = 2)
      .orderBy("rn").select("id", "hd").as[(Long, Long)].collect().toList
    assert(top === List((1L, 0L), (2L, 3L)))
  }

  test("bits are partition-invariant (bit_or is order-free)") {
    val a = BqIndex.encode(nodesDf.coalesce(1), bounds).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = BqIndex.encode(nodesDf.repartition(7), bounds).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }

  test("searchBq: corpus-vector queries re-find themselves at hd=0; gate=0 " +
      "shuffle plan agrees") {
    val res = BqIndex.searchBq(bits, bounds, queriesDf, k = 10)
    assert(res.columns.toSeq === Seq("query_id", "id", "hd", "rn"))
    val self = res.filter(col("query_id") === col("id"))
      .select("hd").as[Long].collect()
    assert(self.length === queriesDf.count())
    assert(self.forall(_ === 0L))
    val shuffled = BqIndex.searchBq(bits, bounds, queriesDf, k = 10,
        broadcastBytes = 0L)
      .select("query_id", "id", "hd").as[(Long, Long, Long)].collect().toSet
    val hinted = res.select("query_id", "id", "hd")
      .as[(Long, Long, Long)].collect().toSet
    assert(hinted === shuffled)
  }

  test("hammingNearDupPairs: EXACT recall inside the ball vs brute force; " +
      "maxHd past the pigeonhole bound rejected") {
    // brute-force truth: every unordered pair with hd <= 7
    val rows = bits.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    def hd(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val want = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      d = hd(rows(i)._2, rows(j)._2) if d <= 7
    } yield (rows(i)._1, rows(j)._1, d)).toSet
    val got = BqIndex.hammingNearDupPairs(bits, maxHd = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want) // pigeonhole: banding misses nothing at hd<=7
    // tighter radius → wider (2-byte) super-bands; exactness must hold
    // through the band-regrouping path too
    val want3 = want.filter(_._3 <= 3L)
    val got3 = BqIndex.hammingNearDupPairs(bits, maxHd = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got3 === want3)
    // 64 bits -> 8 byte-granularity bands -> exact only to hd 7; 8 throws
    val e = intercept[IllegalArgumentException] {
      BqIndex.hammingNearDupPairs(bits, maxHd = 8)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // band count must partition the code bytes evenly
    val e2 = intercept[IllegalArgumentException] {
      BqIndex.hammingNearDupPairs(bits, maxHd = 4)
    }
    assert(e2.getMessage.contains("divide"))
  }

  test("hammingNearDupPairs: wide bands (g > 4 bytes) keep exactness AND " +
      "distinct buckets — the shift-wrap regression case") {
    // 128-dim codes (4 words = 16 bytes) at maxHd = 0 give ONE 16-byte
    // band (g = 16): the old shift-packing wrapped the shift amount past
    // the lane width there, aliasing distant bytes onto the same bits.
    // Exactness still held (equal bands stayed equal) but unrelated rows
    // collided; the hashed band value must keep both properties.
    def baseVec(i: Long): Seq[Float] =
      (0 until 128).map(j => if (((i >> (j % 6)) & 1L) == 1L) 10f else 0f)
    val wide = (
      (0L until 48L).map(i => (i, baseVec(i))) ++
      // exact twins (hd = 0 pairs) and 1-dim flips (hd = 1 pairs)
      (0L until 4L).map(i => (100L + i, baseVec(i))) ++
      (4L until 8L).map(i => (200L + i,
        baseVec(i).zipWithIndex.map { case (v, j) =>
          if (j == 0) 10f - v else v }))
    ).toDF("id", "vector")
    val wb = SqIndex.trainBounds(wide)
    val wbits = BqIndex.encode(wide, wb)
    val rows = wbits.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(rows.forall(_._2.length == 4)) // 16-byte codes
    def hd(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    for (maxHd <- Seq(0, 1, 3)) { // g = 16, 8, 4
      val want = (for {
        i <- rows.indices; j <- (i + 1) until rows.length
        d = hd(rows(i)._2, rows(j)._2) if d <= maxHd
      } yield (rows(i)._1, rows(j)._1, d)).toSet
      val got = BqIndex.hammingNearDupPairs(wbits, maxHd)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"maxHd=$maxHd")
      // the twins guarantee the check is non-vacuous: 4 exact-dup pairs
      // at every radius, plus 4 hd = 1 pairs once maxHd >= 1
      assert(want.size >= (if (maxHd == 0) 4 else 8), s"maxHd=$maxHd")
    }
  }

  test("IVF-BQ at full probe equals plain BQ; partial probe is a subset " +
      "per query") {
    val centroids = IvfIndex.sampleCodebook(nodesDf, k = 8)
    val asg = IvfIndex.assign(nodesDf, centroids).select("id", "cell")
    val full = BqIndex.searchIvfBq(bits, asg, centroids, bounds,
        queriesDf, k = 10, nProbe = 8)
      .select("query_id", "id", "hd", "rn")
      .as[(Long, Long, Long, Int)].collect().toSet
    val plain = BqIndex.searchBq(bits, bounds, queriesDf, k = 10)
      .select("query_id", "id", "hd", "rn")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(full === plain) // probing every cell = scanning everything
    val partial = BqIndex.searchIvfBq(bits, asg, centroids, bounds,
        queriesDf, k = 10, nProbe = 2)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect()
    assert(partial.nonEmpty)
    for ((_, rows) <- partial.groupBy(_._1)) {
      // contiguous ranks from 1, at most k — the searchBq contract holds
      // on the probed subset too
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length))
      assert(rows.length <= 10)
    }
  }

  test("shortlist + exact re-rank: knnExact contract, recall clears the " +
      "1-bit fixture floor") {
    val res = BqIndex.searchBqRerankScored(nodesDf, bits, bounds,
      queriesDf, k = 10, shortlist = 100, minSim = -2.0)
    assert(res.columns.toSeq === Seq("query_id", "id", "score", "rn"))
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val got = res.select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // one bit per dimension is the coarsest code — the floor is
    // calibrated to the fixture (100-deep shortlist over 500 vectors)
    assert(recall >= 0.4, s"recall $recall")
  }
}
