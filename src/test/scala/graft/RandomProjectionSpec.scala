package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnSearch, RandomProjection}
import graft.queries.VectorQueries

/** Seeded JL projection: exact reproducibility of the quantized
  * coordinates and neighborhood preservation of the float path. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)

  test("projectMicro reproduces a driver-side sequential-double mirror " +
      "exactly (the oracle-parity property)") {
    val seed = 41L
    val planes = RandomProjection.gaussians(seed, outDim = 16, inDim = 64)
    val got = RandomProjection.projectMicro(emb, seed, 16, 64,
        idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.size === vecs.size)
    for ((id, v) <- vecs.take(50)) {
      val want = planes.map { w =>
        var acc = 0.0
        var j = 0
        while (j < w.length) { acc += v(j).toDouble * w(j).toDouble; j += 1 }
        math.floor(acc * 1000000.0 + 0.5).toLong
      }.toSeq
      assert(got(id) === want, s"id $id")
    }
  }

  test("gaussians are a pure function of the seed; different seeds give " +
      "different matrices") {
    val a = RandomProjection.gaussians(41L, 4, 8)
    val b = RandomProjection.gaussians(41L, 4, 8)
    val c = RandomProjection.gaussians(42L, 4, 8)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
  }

  test("JL distance preservation: projected cosine tracks full-dim " +
      "cosine within the dimension-bound error") {
    // the JL property itself: per-pair angle distortion concentrates
    // around 1/sqrt(outDim). The fixture's neighbor GAPS are smaller
    // than that (inter-vector cosines top out ~0.5 — see NOTES), so the
    // right check is distortion, not top-k recall at high compression.
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val proj16 = RandomProjection.project(emb, seed = 41L,
        outDim = 16, inDim = 64, idCol = "vec_id", vecCol = "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val ids = vecs.keys.toSeq.sorted.take(40)
    val errs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield math.abs(
      cos(vecs(ids(i)), vecs(ids(j))) - cos(proj16(ids(i)), proj16(ids(j))))
    val meanErr = errs.sum / errs.length
    assert(meanErr <= 0.25, s"mean |Δcos| $meanErr") // ~1/sqrt(16) regime
    assert(errs.max <= 0.8, s"max |Δcos| ${errs.max}")
  }

  test("searchRerank: exact raw-space re-rank of the projected shortlist " +
      "restores recall well above the raw projected top-k") {
    val queriesFull = VectorQueries.querySet(emb)
    val exact = KnnSearch.knnExact(nodesDf, queriesFull, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val rer = RandomProjection.searchRerank(nodesDf, queriesFull,
        k = 10, shortlist = 80, seed = 41L, outDim = 16, inDim = 64)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(rer).size.toDouble / exact.size
    // 4x compression + 8x-k shortlist on the weakly-separated fixture:
    // the re-rank recovers every true neighbor the shortlist catches
    // (measured 0.64-0.65 at both sf0.001 and sf0.01; floor below the
    // measured value — see e03's pinned overlap10 column for the exact
    // per-query counts).
    assert(recall >= 0.6, s"recall $recall")
    // and the re-rank is what does it: the UN-reranked projected top-10
    // must be strictly worse on this fixture
    val projTop = KnnSearch.knnExact(
        RandomProjection.project(nodesDf, 41L, 16, 64)
          .withColumn("deleted", lit(false)),
        RandomProjection.project(
            queriesFull.select(col("query_id").as("id"),
              col("query_vec").as("vector")), 41L, 16, 64)
          .select(col("id").as("query_id"), col("vector").as("query_vec")),
        10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val projRecall = exact.intersect(projTop).size.toDouble / exact.size
    assert(recall > projRecall,
      s"rerank recall $recall vs projected-only $projRecall")
  }

  test("searchRerank respects tombstones: a deleted node never surfaces") {
    val del = nodesDf.withColumn("deleted", col("id") % 7 === 0)
    val got = RandomProjection.searchRerank(del,
        VectorQueries.querySet(emb), k = 10, shortlist = 80,
        seed = 41L, outDim = 16, inDim = 64)
      .filter(col("id") % 7 === 0).count()
    assert(got === 0L)
  }

  test("mrlSearchRerank: full-dim prefix reproduces exact search; " +
      "16-dim prefix returns k ranked rows per query, tombstones hidden") {
    val queriesDf = VectorQueries.querySet(emb)
    // dPrefix = dim → the shortlist IS full-dim exact; top-k must match
    val full = RandomProjection.mrlSearchRerank(nodesDf, queriesDf,
        k = 10, shortlist = 80, dPrefix = 64)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(full === exact)
    // truncated prefix: complete ranked result per query
    val mrl = RandomProjection.mrlSearchRerank(nodesDf, queriesDf,
        k = 10, shortlist = 80, dPrefix = 16)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect()
    val perQ = mrl.groupBy(_._1)
    assert(perQ.values.forall(_.length === 10))
    assert(perQ.values.forall(_.map(_._3).sorted.toSeq === (1 to 10)))
    // tombstoned nodes never surface through the truncated path either
    val del = nodesDf.withColumn("deleted", col("id") % 7 === 0)
    val got = RandomProjection.mrlSearchRerank(del, queriesDf,
        k = 10, shortlist = 80, dPrefix = 16)
      .filter(col("id") % 7 === 0).count()
    assert(got === 0L)
  }

  test("JL 64 -> 32 preserves cosine neighborhoods: recall@10 clears the " +
      "floor against exact full-dim search") {
    val proj = RandomProjection.project(nodesDf, seed = 41L,
      outDim = 32, inDim = 64).withColumn("deleted", lit(false))
    val queriesFull = VectorQueries.querySet(emb)
    val queriesProj = RandomProjection.project(
      queriesFull.select(col("query_id").as("id"),
        col("query_vec").as("vector")),
      seed = 41L, outDim = 32, inDim = 64)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val exact = KnnSearch.knnExact(nodesDf, queriesFull, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val inProj = KnnSearch.knnExact(proj, queriesProj, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(inProj).size.toDouble / exact.size
    // 2x compression on the weakly-separated 500-vector fixture —
    // calibrated floor (the fixture's tiny cosine gaps cap what ANY
    // 2x-compression can retain; scale evidence lives in ScaleProbe)
    assert(recall >= 0.3, s"recall $recall")
  }
}
