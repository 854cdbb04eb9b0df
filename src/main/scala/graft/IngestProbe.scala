package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IndexParams

/** Manual scale probe for the UNIFIED streaming ingest
  * ([[VectorStore.startIngest]]): build every serving tier (ANN graph +
  * PQ + SQ) over N vectors, then stream B-row micro-batches through the
  * one ingest query and report the per-batch wall — the evidence for
  * SCALING.md's claim that a batch folds into EVERY tier at O(batch),
  * not O(corpus): per-batch wall must stay flat across batches and
  * across N (job overhead + |Δ| work), far below any tier's build wall.
  *
  * Usage: `sbt "runMain graft.IngestProbe 100000 64 1000 5"`
  * (n, dim, batchRows, nBatches).
  */
object IngestProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val batchRows = if (args.length > 2) args(2).toLong else 1000L
    val nBatches = if (args.length > 3) args(3).toInt else 5
    // optional 5th arg: comma-separated tier subset ("graph,pq,sq",
    // default all) — the 10 M rung exercises the PQ/SQ fold-in without
    // paying an ~hour-scale full graph build the ingest path doesn't
    // re-run anyway (appends fold into EXISTING generations)
    val tiers = (if (args.length > 4) args(4) else "graph,pq,sq")
      .split(",").map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val partitions = math.max(cpus.toInt, (n / 20000L).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ONE generator over base + all batch ids — a batch generated from
    // its own 0-based range would DUPLICATE base vectors (the modular
    // fixture-aliasing trap), making self-query ranks tie toward base ids
    val all = ScaleProbe
      .syntheticVectors(spark, n + nBatches * batchRows, dim)
      .localCheckpoint()
    val base = all.filter(col("id") < n).localCheckpoint()
    val store = VectorStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-ingest-probe"),
      IndexParams(dim = dim))
    val (_, tLoad) = timed(store.addBatch(base))
    val (_, tGraph) =
      if (tiers("graph")) timed(store.rebuild()) else ((), -1.0)
    val (_, tPq) =
      if (tiers("pq")) timed(store.buildPqIndex(
        cells = if (n >= 5000000L) 1024 else 256)) else ((), -1.0)
    val (_, tSq) =
      if (tiers("sq")) timed(store.buildSqIndex()) else ((), -1.0)

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float], String, Long)]
    val q = store.startIngest(stream.toDF().toDF("id", "vector", "op", "seq"))
    val batchWalls = scala.collection.mutable.ArrayBuffer.empty[Double]
    // optional 6th arg "serve": from HALFWAY through the stream onward,
    // run searchAuto on DEFAULTS against the live (mid-ingest) store
    // after EVERY batch and record the dispatched arm's wall +
    // recall@10 vs the exact scan over the same overlay — the composed
    // evidence that a store under continuous ingest keeps serving at
    // its measured quality (build-once artifacts plus O(|Δ|) folds,
    // not a drifted index), AND that repeat serves stay WARM across
    // delta pointer flips: the first serve pays the generation's pack
    // once ([[VectorStore.servingPqIndex]]'s base memo survives
    // k-flips), every later serve must track the warm wall, not the
    // 136 s-at-30 M re-pack that per-stamp keying forced
    val midServe = args.length > 5 && args(5) == "serve"
    var midJson = ""
    val serveRows = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      for (b <- 0 until nBatches) {
        val lo = n + b * batchRows
        val rows = all
          .filter(col("id") >= lo && col("id") < lo + batchRows)
          .select(col("id"), col("vector"))
          .as[(Long, Seq[Float])].collect()
          .map { case (id, v) => (id, v, "upsert", id) }
        stream.addData(rows.toIndexedSeq)
        val (_, t) = timed(q.processAllAvailable())
        batchWalls += t
        if (midServe && b >= nBatches / 2) {
          val qv = store.nodes.filter(col("id") % (n / 20) === 3)
            .limit(20)
            .select(col("id").as("query_id"), col("vector").as("query_vec"))
            .localCheckpoint()
          val ((strat, got), tServe) = timed {
            val (st, r) = store.searchAuto(qv, k = 10, strengthSetting = 0)
            (st, r.select("query_id", "id").collect()
              .map(x => (x.getLong(0), x.getLong(1))).toSet)
          }
          val (exact, tEx) = timed(
            graft.operators.KnnSearch.knnExact(
                store.nodes.filter(!col("deleted")), qv, 10, minSim = 0.0)
              .select("query_id", "id").collect()
              .map(x => (x.getLong(0), x.getLong(1))).toSet)
          val recall = exact.intersect(got).size.toDouble /
            math.max(1, exact.size)
          serveRows += s"""{"batch":$b,"strategy":"$strat",""" +
            f""""serve_sec":$tServe%.2f,"exact_sec":$tEx%.2f,""" +
            f""""recall_at_10":$recall%.3f}"""
        }
      }
    } finally q.stop()
    if (serveRows.nonEmpty)
      midJson = s""","mid_serves":${serveRows.mkString("[", ",", "]")}"""
    // serving sanity: the last batch's rows are visible on every arm
    val lastId = n + nBatches.toLong * batchRows - 1L
    val qv = store.getNode(lastId).map { case (id, v, _) =>
      Seq((id, v)).toDF("query_id", "query_vec")
    }.getOrElse(sys.error(s"ingested id $lastId missing from node table"))
    val seededOk = !tiers("graph") ||
      store.searchAnnSeededIvf(qv, k = 1, strengthSetting = 0)
        .select("id").as[Long].head() == lastId
    val pqOk = !tiers("pq") ||
      store.searchPq(qv, k = 1, strengthSetting = 0)
        .select("id").as[Long].head() == lastId

    val walls = batchWalls.map(w => f"$w%.2f").mkString("[", ",", "]")
    println(s"""{"n":$n,"dim":$dim,"batch_rows":$batchRows,""" +
      s""""load_sec":$tLoad,"graph_build_sec":$tGraph,""" +
      s""""pq_build_sec":$tPq,"sq_build_sec":$tSq,""" +
      s""""batch_walls_sec":$walls,""" +
      s""""seeded_serves_new":$seededOk,"pq_serves_new":$pqOk""" +
      midJson + "}")
    spark.stop()
  }
}
