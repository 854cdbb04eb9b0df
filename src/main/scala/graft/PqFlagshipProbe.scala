package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AdaptiveSearch, IndexParams, KnnSearch}

/** Flagship probe for the dispatcher's PQ regime: the claimed
  * ≥ `pqCutoff` (5 M) economics had never fired in an end-to-end run —
  * every prior flagship served kept corpora ≤ 151 k. This probe stands
  * up a vector store PAST the cutoff (default 10 M × 64), builds the
  * residual IVF-PQ generation through the facade, and lets
  * [[VectorStore.searchAuto]] dispatch on its own measured stats — the
  * honest check that the UsePq arm engages where it claims to, with the
  * serve wall and recall@10 vs the exact scan recorded.
  *
  * Usage: `sbt "runMain graft.PqFlagshipProbe 10000000 64 1024"`.
  */
object PqFlagshipProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 1024
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val partitions = math.max(cpus.toInt, (n / 50000L).toInt)
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

    def phase(s: String): Unit =
      System.err.println(s"[pq-flagship] $s ${java.time.Instant.now()}")

    val store = VectorStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-pq-flagship"),
      IndexParams(dim = dim))
    phase("load")
    val (_, tLoad) = timed(
      store.addBatch(ScaleProbe.syntheticVectors(spark, n, dim)
        .select(col("id"), col("vector"))))
    phase("build")
    val (_, tBuild) = timed(store.buildPqIndex(cells = cells))
    phase("serve")
    val qv = store.nodes.filter(col("id") % (n / 20) === 3).limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()
    // dispatch on the store's own measured stats — no cutoff overrides
    def serve() = store.searchAuto(qv, k = 10, strengthSetting = 0)
    val ((strat1, res1), tServe1) = timed {
      val (st, r) = serve(); (st, r.localCheckpoint())
    }
    val n1 = res1.count()
    val (res2, tServe2) = timed(serve()._2
      .select("query_id", "id").collect())
    val got = res2.map(r => (r.getLong(0), r.getLong(1))).toSet
    val (exact, tExact) = timed(
      KnnSearch.knnExact(store.nodes.filter(!col("deleted")), qv, 10,
          minSim = KnnSearch.scaleThreshold(0))
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val recall = exact.intersect(got).size.toDouble / exact.size
    // the recall lever at this n: deeper shortlist + wider probe (the
    // serve stays code-scan-shaped; only the re-rank tail grows)
    val (deepRows, tDeep) = timed(
      store.searchPq(qv, k = 10, strengthSetting = 0, nProbe = 32,
          shortlist = 5000)
        .select("query_id", "id").collect())
    val deepRecall = deepRows.map(r => (r.getLong(0), r.getLong(1)))
      .count(exact.contains).toDouble / exact.size
    println(s"""{"n":$n,"dim":$dim,"cells":$cells,""" +
      s""""strategy":"$strat1","load_sec":${f"$tLoad%.1f"},""" +
      s""""pq_build_sec":${f"$tBuild%.1f"},""" +
      s""""serve_cold_sec":${f"$tServe1%.2f"},""" +
      s""""serve_warm_sec":${f"$tServe2%.2f"},""" +
      s""""result_rows":$n1,"exact_scan_sec":${f"$tExact%.1f"},""" +
      s""""recall_at_10":$recall,""" +
      s""""deep_serve_sec":${f"$tDeep%.2f"},""" +
      s""""deep_recall_at_10":$deepRecall}""")
    val dispatched = strat1 == AdaptiveSearch.UsePq
    if (!dispatched)
      println(s"""{"error":"expected UsePq, dispatched $strat1"}""")
    store.delete()
    spark.stop()
    if (!dispatched) sys.exit(1)
  }
}
