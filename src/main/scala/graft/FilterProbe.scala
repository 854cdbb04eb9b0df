package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IndexParams

/** Manual scale probe for FILTERED index-arm search: measure each arm's
  * wall at filter selectivities 1 (no filter), 1/10 and 1/100 of the
  * corpus — the evidence for SCALING.md's claim that the pre-filter
  * semi-join makes index-arm work scale with the FILTERED fraction, not
  * the corpus (a post-filter design would show flat walls across
  * selectivities). Also times the exact filtered scan ([[VectorStore
  * .searchWhere]]) at the same selectivities — the dispatcher's
  * under-the-cutoff arm.
  *
  * Usage: `sbt "runMain graft.FilterProbe 200000 64"`.
  */
object FilterProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val partitions = math.max(cpus.toInt, (n / 20000L).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val nodes = ScaleProbe.syntheticVectors(spark, n, dim).localCheckpoint()
    val store = VectorStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-filter-probe"),
      IndexParams(dim = dim))
    store.addBatch(nodes)
    val qv = nodes.filter(col("id") % (n / 20) === 3).limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()

    // `lsh` mode: the CORRELATED-predicate regime on the LSH arm —
    // mod-10/mod-100 filters select (a slice of) cluster 0 while the
    // queries live in cluster 3, so the exact-bucket equi-join starves
    // at any band/bit setting. Measures probeBuckets = 1 (starved) vs
    // the escalated occupied-bucket multi-probe
    // ([[graft.operators.AnnSearch.searchLshKeyed]]); ground truth is
    // the filtered exact top-10, walls min-of-2 warm runs.
    if (args.length > 2 && args(2) == "lsh") {
      import graft.operators.{AnnSearch, KnnSearch}
      val p = IndexParams(dim = dim)
      val arms = for (m <- Seq(10L, 100L)) yield {
        val fnodes = nodes.filter(col("id") % m === 0L).localCheckpoint()
        val idF = fnodes.select("id").localCheckpoint()
        val fexact = KnnSearch.knnExact(fnodes, qv, 10, minSim = -2.0)
          .select("query_id", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // optional 4th arg: comma-separated probeBuckets overrides (the
        // recall-vs-probes curve, probe-all clause off); default =
        // starved (1) vs the old volume-constant budget (1×/sel) vs the
        // DISPATCHER DEFAULT (3×/sel with the probe-all clause armed at
        // 10× budget — the AdaptiveSearch UseLsh / searchAnn(predicate=)
        // configuration)
        val cfgs: Seq[(Int, Int)] =
          (if (args.length > 3)
            args(3).split(",").map(_.toInt).toSeq.map(pb => (pb, 0))
          else {
            val esc1 = AnnSearch.escalatedProbes(1, n / m, n,
              1L << p.bucketBits)
            val def3 = AnnSearch.escalatedProbes(3, n / m, n,
              1L << p.bucketBits)
            Seq((1, 0), (esc1, 0), (def3, 10 * def3))
          }).distinct
        val runs = for ((pb, pao) <- cfgs) yield {
          def run() = AnnSearch.searchLsh(nodes, qv, 10, minSim = -2.0, p,
              idFilter = Some(idF), probeBuckets = pb, probeAllOcc = pao)
            .select("query_id", "id").collect()
          val (rows, t1) = timed(run())
          val t = math.min(t1, timed(run())._2)
          val recall = rows.map(r => (r.getLong(0), r.getLong(1)))
            .count(fexact.contains).toDouble / fexact.size
          s"""{"mod":$m,"probe_buckets":$pb,"probe_all_occ":$pao,""" +
            s""""sec":$t,"recall_at_10":$recall}"""
        }
        runs.mkString(",")
      }
      println(s"""{"n":$n,"dim":$dim,"lsh_arms":[${arms.mkString(",")}]}""")
      spark.stop()
      return
    }

    // `escalation` mode: fixed vs selectivity-escalated probes for the
    // plain-IVF and residual-PQ arms — the measured basis for extending
    // the seeded arm's escalation rule ([[graft.operators.AnnSearch
    // .escalatedProbes]]) to the other two probed paths. Ground truth is
    // the filtered exact top-10; walls are min-of-2 warm runs.
    if (args.length > 2 && args(2) == "escalation") {
      import graft.operators.{AnnSearch, IvfIndex, KnnSearch, PqIndex}
      store.buildPqIndex(cells = 1024)
      val pre = store.loadPqIndex()
      val cells = pre.centroids.count()
      val asgV = pre.assignments
        .join(nodes.select(col("id"), col("vector")), Seq("id"))
        .select(col("cell"), col("id"), col("vector")).localCheckpoint()
      val arms = for (m <- Seq(10L, 100L)) yield {
        val fnodes = nodes.filter(col("id") % m === 0L).localCheckpoint()
        val idF = fnodes.select("id").localCheckpoint()
        val fexact = KnnSearch.knnExact(fnodes, qv, 10, minSim = -2.0)
          .select("query_id", "id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val probes = Seq(8,
          AnnSearch.escalatedProbes(8, n / m, n, cells)).distinct
        val runs = for (nProbe <- probes) yield {
          def runIvf() = IvfIndex.search(nodes, pre.centroids, qv, 10,
              minSim = -2.0, nProbe, assignments = Some(asgV),
              idFilter = Some(idF))
            .select("query_id", "id").collect()
          def runPq(shortlist: Int) = PqIndex.searchIvfPqResidualScored(
              nodes, pre.codes,
              pre.assignments, pre.centroids, pre.codebooks, qv, 10,
              shortlist, nProbe, m = 8, subLen = dim / 8,
              minSim = -2.0, idFilter = Some(idF))
            .select("query_id", "id").collect()
          def recallOf(rows: Array[org.apache.spark.sql.Row]) =
            rows.map(r => (r.getLong(0), r.getLong(1)))
              .count(fexact.contains).toDouble / fexact.size
          val (ivfRows, tIvf1) = timed(runIvf())
          val tIvf = math.min(tIvf1, timed(runIvf())._2)
          val (pqRows, tPq1) = timed(runPq(500))
          val tPq = math.min(tPq1, timed(runPq(500))._2)
          // shortlist escalated by the same rule (cap = corpus): keep the
          // MATCHING re-rank volume constant under the filter — the
          // recall tail the fixed-500 ADC shortlist leaves behind
          val sEsc = AnnSearch.escalatedProbes(500, n / m, n, n)
          val (pqsRows, tPqs1) = timed(runPq(sEsc))
          val tPqs = math.min(tPqs1, timed(runPq(sEsc))._2)
          s"""{"mod":$m,"n_probe":$nProbe,""" +
            s""""ivf_sec":$tIvf,"ivf_recall_at_10":${recallOf(ivfRows)},""" +
            s""""pq_sec":$tPq,"pq_recall_at_10":${recallOf(pqRows)},""" +
            s""""pq_shortlist_esc":$sEsc,"pq_esc_sec":$tPqs,""" +
            s""""pq_esc_recall_at_10":${recallOf(pqsRows)}}"""
        }
        runs.mkString(",")
      }
      println(s"""{"n":$n,"dim":$dim,"cells":$cells,""" +
        s""""escalation_arms":[${arms.mkString(",")}]}""")
      spark.stop()
      return
    }

    store.buildPqIndex()
    store.buildSqIndex()

    val fracs = Seq(("all", None), ("mod10", Some(10L)), ("mod100", Some(100L)))
    val out = new StringBuilder(s"""{"n":$n,"dim":$dim""")
    for ((label, m) <- fracs) {
      val pred = m.map(k => col("id") % k === 0L)
      // warm once, then measure (the memoized-artifact reload pattern)
      store.searchSq(qv, k = 10, strengthSetting = 0, predicate = pred)
        .count()
      val (_, tSq) = timed(store.searchSq(qv, k = 10, strengthSetting = 0,
        predicate = pred).count())
      store.searchPq(qv, k = 10, strengthSetting = 0, predicate = pred)
        .count()
      val (_, tPq) = timed(store.searchPq(qv, k = 10, strengthSetting = 0,
        predicate = pred).count())
      val tEx = pred.map { p =>
        store.searchWhere(qv, k = 10, p, strengthSetting = 0).count()
        timed(store.searchWhere(qv, k = 10, p, strengthSetting = 0)
          .count())._2
      }.getOrElse {
        store.search(qv, k = 10, strengthSetting = 0).count()
        timed(store.search(qv, k = 10, strengthSetting = 0).count())._2
      }
      out ++= s""","sq_$label":$tSq,"pq_$label":$tPq,"exact_$label":$tEx"""
    }
    out ++= "}"
    println(out.toString)
    spark.stop()
  }
}
