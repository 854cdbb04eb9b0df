package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnSearch, PqIndex}
import graft.queries.VectorQueries

/** Product quantization: code-table invariants, ADC reconstruction
  * properties, and recall against the exact oracle. ADC is lossy by
  * construction, so recall floors are calibrated to the fixture (m=8,
  * subLen=8, ksub=16 sample codebook over 500 64-dim vectors). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val m = 8
  private val subLen = 8
  private val ksub = 16

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)
  private lazy val queriesDf = VectorQueries.querySet(emb)
  private lazy val cb = PqIndex.sampleCodebooks(nodesDf, m, subLen, ksub)
  private lazy val codes = PqIndex.encode(nodesDf, cb, m, subLen)

  test("subspace rule scales with dim: ~8-dim subvectors, minimum 8 " +
      "subspaces — dim 64 keeps the historical m=8 geometry") {
    // fixed m=8 at 384 dims quantizes 48-dim subvectors with one byte
    // each — measured recall collapse (SCALING.md dim-384 rung)
    assert(PqIndex.subspaces(8) === 8)   // subLen 1 (tiny spec fixtures)
    assert(PqIndex.subspaces(64) === 8)  // subLen 8 — every hash row
    assert(PqIndex.subspaces(128) === 16)
    assert(PqIndex.subspaces(384) === 48) // the MiniLM shape
    assert(PqIndex.subspaces(768) === 96)
  }

  test("codebooks: m×ksub sub-centroids of subLen each") {
    val rows = cb.collect()
    assert(rows.length == m * ksub)
    assert(rows.forall(_.getSeq[Float](2).length == subLen))
    val bySub = rows.groupBy(_.getInt(0))
    assert(bySub.keySet == (0 until m).toSet)
    assert(bySub.values.forall(_.map(_.getInt(1)).sorted.toSeq == (0 until ksub)))
  }

  test("encode: every live vector gets exactly m codes in [0, ksub)") {
    val n = nodesDf.count()
    assert(codes.count() == n * m)
    assert(codes.filter(col("code") < 0 || col("code") >= ksub).isEmpty)
    assert(codes.groupBy("id").count().filter(col("count") =!= m).isEmpty)
  }

  test("encode of a codebook-source vector is the identity code row") {
    // vector j < ksub IS code j's centroid in every subspace: distance 0
    // to itself, so argmin (ties toward low code) must pick code j or an
    // exactly-duplicate earlier centroid; on this fixture vectors are
    // distinct, so the code is exactly j
    val own = codes.filter(col("id") < ksub)
      .filter(col("code") =!= col("id"))
    assert(own.isEmpty, s"self-encode mismatches: ${own.count()}")
  }

  test("tombstoned vectors are not encoded") {
    val withDead = nodesDf.withColumn("deleted", col("id") % 7 === 0)
    val enc = PqIndex.encode(withDead, cb, m, subLen)
    assert(enc.filter(col("id") % 7 === 0).isEmpty)
  }

  test("ADC search: recall@10 vs exact clears the fixture floor") {
    val approx = PqIndex.searchAdc(codes, cb, queriesDf, 10, m, subLen)
    // ADC approximates EUCLIDEAN distance — compare against the euclidean
    // exact ranking (cosine order differs on non-normalized vectors)
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0,
        metric = "euclidean")
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val got = approx.select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    // 16-entry sample codebooks are coarse — the honest raw-ADC floor is
    // low; the production-quality path is the reranked one below
    assert(recall >= 0.15, s"ADC recall@10 = $recall")
    val reranked = PqIndex.searchAdcRerank(nodesDf, codes, cb, queriesDf,
        10, 80, m, subLen)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val rr = exact.intersect(reranked).size.toDouble / exact.size
    assert(rr >= 0.6, s"reranked recall@10 = $rr")
    assert(rr > recall, s"rerank must improve recall: $rr vs $recall")
    // and the quantized self-match property: a query that IS a corpus
    // vector has ADC distance 0 to its own codes, so it must appear in
    // its own top-k (ties broken by id cannot push 10 zero-distance
    // duplicates ahead on this fixture)
    val self = approx.filter(col("query_id") === col("id")).count()
    assert(self == queriesDf.count(), s"self-hits $self")
  }

  test("trained codebooks: same shape, and rerank recall not worse than sample") {
    val trained = PqIndex.trainCodebooks(nodesDf, m, subLen, ksub, iters = 2)
    val rows = trained.collect()
    assert(rows.length == m * ksub)
    assert(rows.forall(_.getSeq[Float](2).length == subLen))
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0,
        metric = "euclidean")
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    def rr(cbk: org.apache.spark.sql.DataFrame): Double = {
      val enc = PqIndex.encode(nodesDf, cbk, m, subLen)
      val got = PqIndex.searchAdcRerank(nodesDf, enc, cbk, queriesDf,
          10, 80, m, subLen)
        .select("query_id", "id").as[(Long, Long)].collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val (rs, rt) = (rr(cb), rr(trained))
    assert(rt >= rs - 0.05, s"trained $rt vs sample $rs")
  }

  test("k-means++ seeding: full geometry, deterministic across " +
      "partitionings, recall in family with sample init") {
    // A-Res D² sampling is a pure function of (data, round), so the seeds
    // must not move under a different physical layout
    val s1 = PqIndex.seedCodebooksPP(nodesDf.coalesce(1), m, subLen, ksub)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .toSet
    val s2 = PqIndex.seedCodebooksPP(nodesDf.repartition(7), m, subLen, ksub)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .toSet
    assert(s1 === s2)
    // geometry: every sub has ksub distinct codes of subLen floats
    val bySub = s1.groupBy(_._1)
    assert(bySub.keySet === (0 until m).toSet)
    assert(bySub.values.forall(_.size == ksub))
    assert(s1.forall(_._3.length == subLen))
    // the PP-trained codebook must stay in the same recall family as the
    // sample-trained one (measured equal on the probe data — SCALING.md;
    // this pins "not broken", the probe pins "not better")
    val trainedPP = PqIndex.trainCodebooksPP(nodesDf, m, subLen, ksub,
      iters = 1)
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0,
        metric = "euclidean")
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val enc = PqIndex.encode(nodesDf, trainedPP, m, subLen)
    val got = PqIndex.searchAdcRerank(nodesDf, enc, trainedPP, queriesDf,
        10, 80, m, subLen)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.5, s"PP-trained rerank recall $recall")
  }

  test("IVF-PQ: results equal plain ADC restricted to probed cells") {
    val coarse = graft.operators.IvfIndex.sampleCodebook(nodesDf, k = 10)
    val asg = graft.operators.IvfIndex.assign(nodesDf, coarse)
      .select(col("id"), col("cell"))
    val ivfpq = PqIndex.searchIvfPq(codes, asg, coarse, cb, queriesDf,
        k = 10, nProbe = 10, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    // nProbe = all cells ⇒ candidate set = whole corpus ⇒ must equal ADC
    val adc = PqIndex.searchAdc(codes, cb, queriesDf, 10, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(ivfpq == adc)
    // and with nProbe = 1 every result id must live in the query's own
    // nearest cell (assign uses the same (sim desc, cell asc) ordering as
    // the probe ranking)
    val one = PqIndex.searchIvfPq(codes, asg, coarse, cb, queriesDf,
        k = 10, nProbe = 1, m, subLen)
    val qcell = graft.operators.IvfIndex.assign(
        queriesDf.select(col("query_id").as("id"),
          col("query_vec").as("vector")), coarse)
      .select(col("id").as("query_id"), col("cell").as("qcell"))
    val joined = one.join(asg, Seq("id")).join(qcell, Seq("query_id"))
    assert(joined.filter(col("cell") =!= col("qcell")).isEmpty)
  }

  test("broadcast gate=0 forces shuffle plans with identical results") {
    // Q-proportional side tables (LUT, candidate shortlist, query vectors)
    // must have a non-broadcast path: force the gate shut AND disable
    // Spark's own auto-broadcast so the executed plans contain no
    // BroadcastExchange at all, then check result parity on all three
    // PQ search paths.
    val coarse = graft.operators.IvfIndex.sampleCodebook(nodesDf, k = 10)
    val asg = graft.operators.IvfIndex.assign(nodesDf, coarse)
      .select(col("id"), col("cell"))
    val adcB = PqIndex.searchAdc(codes, cb, queriesDf, 10, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val ivfpqB = PqIndex.searchIvfPq(codes, asg, coarse, cb, queriesDf,
        k = 10, nProbe = 10, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val rerankB = PqIndex.searchAdcRerank(nodesDf, codes, cb, queriesDf,
        k = 10, shortlist = 50, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val autoBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBc = spark.conf
      .get("spark.sql.adaptive.autoBroadcastJoinThreshold", autoBc)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // The PQ-codebook (sub/code/centroid, m×ksub rows) and coarse-
      // centroid (cell/centroid, `cells` rows) broadcasts are by-design
      // and query-count-independent; what must NOT broadcast under gate=0
      // is anything Q-proportional (LUT, probed cells, candidates, query
      // vectors). Collect THIS frame (not a derived one) so executedPlan
      // is the AQE-final plan of what actually ran, then walk it —
      // descending into adaptive/stage wrappers — and check every
      // broadcast's output columns.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
      val allowed = Seq(Set("sub", "code", "centroid"),
        Set("cell", "centroid"))
      def bcastOutputs(p: SparkPlan): Seq[Set[String]] = {
        val self = p match {
          case b: BroadcastExchangeExec => Seq(b.output.map(_.name).toSet)
          case r: ReusedExchangeExec => Seq(r.output.map(_.name).toSet)
          case _ => Nil
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        self ++ kids.flatMap(bcastOutputs)
      }
      def assertNoBroadcast(df: org.apache.spark.sql.DataFrame)
          : Set[(Long, Long, Int)] = {
        val res = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val offenders = bcastOutputs(df.queryExecution.executedPlan)
          .filterNot(o => allowed.exists(o.subsetOf))
        assert(offenders.isEmpty,
          s"Q-proportional side still broadcasts: $offenders")
        res
      }
      assert(assertNoBroadcast(PqIndex.searchAdc(codes, cb, queriesDf, 10,
        m, subLen, broadcastBytes = 0L)) == adcB)
      assert(assertNoBroadcast(PqIndex.searchIvfPq(codes, asg, coarse, cb,
        queriesDf, k = 10, nProbe = 10, m, subLen,
        broadcastBytes = 0L)) == ivfpqB)
      assert(assertNoBroadcast(PqIndex.searchAdcRerank(nodesDf, codes, cb,
        queriesDf, k = 10, shortlist = 50, m, subLen,
        broadcastBytes = 0L)) == rerankB)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", autoBc)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", aqeBc)
    }
  }

  test("residual IVF-PQ: self-hit at rank 1 for codebook-source queries, deterministic") {
    val coarse = graft.operators.IvfIndex.sampleCodebook(nodesDf, k = 10)
    val asg = graft.operators.IvfIndex.assign(nodesDf, coarse)
      .select(col("id"), col("cell"))
    val res = PqIndex.residuals(nodesDf, asg, coarse)
      .select(col("id"), col("vector"))
    val rcb = PqIndex.sampleCodebooks(res, m, subLen, ksub)
    val rcodes = PqIndex.encode(res, rcb, m, subLen)
    def run() = PqIndex.searchIvfPqResidual(rcodes, asg, coarse, rcb,
        queriesDf, k = 10, nProbe = 10, m, subLen)
      .as[(Long, Long, Int)].collect().toSet
    val out = run()
    assert(out === run(), "residual IVF-PQ must be run-to-run deterministic")
    // query 0 is a residual-codebook source: its residual encodes exactly,
    // so under full probe its own cell's LUT scores it ADC=0 → rank 1
    assert(out.contains((0L, 0L, 1)),
      s"self-hit missing: ${out.filter(_._1 == 0L).toSeq.sortBy(_._3)}")
    // every query returns k ranked rows with contiguous ranks
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._3).toSeq.sorted == (1 to 10)))
  }

  test("ADC ranks are partition-order independent (fixed-order row sums)") {
    val a = PqIndex.searchAdc(codes, cb, queriesDf, 10, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val b = PqIndex.searchAdc(codes.repartition(7, col("id")), cb,
        queriesDf.repartition(3), 10, m, subLen)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(a == b)
  }

  test("IP-ADC shortlist: sane recall at fixture scale and the documented " +
      "≥-euclid relation HERE (at 1 M the relation flips — the measured " +
      "reason it is not the serving default, SCALING.md r14 A/B)") {
    val coarse = graft.operators.IvfIndex.sampleCodebook(nodesDf, k = 10)
    val asg = graft.operators.IvfIndex.assign(nodesDf, coarse)
      .select(col("id"), col("cell"))
    val res = graft.operators.PqIndex.residuals(nodesDf, asg, coarse)
      .select(col("id"), col("vector"))
    val rcb = PqIndex.sampleCodebooks(res, m, subLen, ksub)
    val rcodes = PqIndex.encode(res, rcb, m, subLen)
    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "id").as[(Long, Long)]
        .collect().toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    // equal probe budget, equal shortlist depth — only the ADC metric
    // differs: the IP + stored-norm estimate ranks in the ground-truth
    // metric, the euclidean residual one doesn't
    val rIp = recallOf(PqIndex.searchIvfPqResidualIp(rcodes, asg, coarse,
      rcb, queriesDf, k = 10, nProbe = 3, m, subLen,
      nodes = Some(nodesDf)))
    val rEu = recallOf(PqIndex.searchIvfPqResidual(rcodes, asg, coarse,
      rcb, queriesDf, k = 10, nProbe = 3, m, subLen))
    assert(rIp >= rEu, s"IP recall $rIp < euclidean recall $rEu")
    assert(rIp > 0.2, s"IP recall $rIp implausibly low")
  }

  test("packCodesWithNorms: one row per id, m codes, 8-dp positive norm; " +
      "IP search accepts the packed-with-norms layout directly") {
    val packed = PqIndex.packCodesWithNorms(codes, nodesDf)
    assert(packed.columns.toSet === Set("id", "codes", "nrm"))
    assert(packed.count() === nodesDf.count())
    val r = packed.agg(min(size(col("codes"))), max(size(col("codes"))),
      min(col("nrm"))).head()
    assert(r.getInt(0) === m && r.getInt(1) === m)
    assert(r.getDouble(2) > 0.0)
    // packed (id, codes, nrm) serves without a nodes fallback
    val coarse = graft.operators.IvfIndex.sampleCodebook(nodesDf, k = 10)
    val asg = graft.operators.IvfIndex.assign(nodesDf, coarse)
      .select(col("id"), col("cell"))
    val viaPacked = PqIndex.searchIvfPqResidualIp(
      PqIndex.packCodesWithNorms(codes, nodesDf), asg, coarse, cb,
      queriesDf, k = 5, nProbe = 3, m, subLen)
    val viaNodes = PqIndex.searchIvfPqResidualIp(codes, asg, coarse, cb,
      queriesDf, k = 5, nProbe = 3, m, subLen, nodes = Some(nodesDf))
    assert(viaPacked.select("query_id", "id", "rn")
        .as[(Long, Long, Int)].collect().toSet ===
      viaNodes.select("query_id", "id", "rn")
        .as[(Long, Long, Int)].collect().toSet)
    // long codes without norms and no node table: loud contract error
    val e = intercept[IllegalArgumentException] {
      PqIndex.searchIvfPqResidualIp(codes, asg, coarse, cb, queriesDf,
        k = 5, nProbe = 3, m, subLen)
    }
    assert(e.getMessage.contains("nrm"))
  }

  test("adaptive serving defaults: fixture-scale unchanged, large-n " +
      "scaled — the 10 M flagship lands on the measured (5000, 32) knee") {
    import PqIndex.{adaptiveNProbe, adaptiveShortlist}
    // ≤ 256 cells (every default build / oracle fixture): base holds
    assert(adaptiveNProbe(8, 22) === 8)
    assert(adaptiveNProbe(8, 256) === 8)
    // the 10 M flagship's 1024 cells: the measured knee of 32
    assert(adaptiveNProbe(8, 1024) === 32)
    assert(adaptiveNProbe(8, 100000) === 64) // capped
    // shortlist floor at fixture scale (covers every probed candidate)
    assert(adaptiveShortlist(10, 500, 8, 22) === 500)
    assert(adaptiveShortlist(1, 500, 8, 22) === 100)
    // 10 M × nProbe 32 / 1024 cells → ~312 k candidates/query; 1/64 of
    // that ≈ the measured shortlist-5000 operating point
    val s10m = adaptiveShortlist(10, 10000000L, 32, 1024)
    assert(s10m >= 4000 && s10m <= 6000, s"shortlist $s10m")
    assert(adaptiveShortlist(10, Long.MaxValue / 4, 64, 1024) === 100000)
  }

  test("an EMPTY codebook table fails with the explicit geometry error, " +
      "not a bare empty.max") {
    val e = intercept[IllegalArgumentException] {
      PqIndex.encode(nodesDf, cb.filter(lit(false)), m, subLen).collect()
    }
    assert(e.getMessage.contains("empty PQ codebook table"))
  }
}
