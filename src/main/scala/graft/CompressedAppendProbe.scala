package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IndexParams

/** Manual scale probe for the compressed-index append lifecycle
  * ([[VectorStore.appendPqIndex]] / [[VectorStore.appendSqIndex]]): build
  * the PQ and SQ generations on N synthetic vectors through the store
  * facade, then fold in a 1% delta via the frozen-artifact append and
  * compare against the full rebuild — the evidence for SCALING.md's claim
  * that append cost tracks |Δ| (encode the delta + one O(batch) parquet
  * write) while rebuild cost tracks N (retrain + re-encode the corpus).
  *
  * Usage: `sbt "runMain graft.CompressedAppendProbe 100000 64"`.
  */
object CompressedAppendProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val dim = if (args.length > 1) args(1).toInt else 64
    // optional: cap on the PQ training sample (default = the facade's
    // 100 k; pass n to force full-corpus training as the recall control)
    val maxTrain = if (args.length > 2) args(2).toInt else 100000
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

    val dDelta = math.max(1L, n / 100L)
    val all = ScaleProbe.syntheticVectors(spark, n + dDelta, dim)
    val base = all.filter(col("id") < n).localCheckpoint()
    val delta = all.filter(col("id") >= n).localCheckpoint()

    val store = VectorStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-append-probe"),
      IndexParams(dim = dim))
    val (_, tLoad) = timed(store.addBatch(base))
    val (_, tPqBuild) = timed(store.buildPqIndex(maxTrain = maxTrain))
    val (pqStats, tPqAppend) = timed(store.appendPqIndex(delta))
    val (_, tSqBuild) = timed(store.buildSqIndex())
    val (sqStats, tSqAppend) = timed(store.appendSqIndex(delta))
    val (_, tBqBuild) = timed(store.buildBqIndex())
    val (bqStats, tBqAppend) = timed(store.appendBqIndex(delta))
    // serving sanity through the overlaid view: self-queries from the
    // appended delta must be servable (counts only — recall is the
    // ScaleProbe ladder's job)
    val qv = delta.limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()
    val (nPqHits, tPqSearch) = timed(
      store.searchPq(qv, k = 10, strengthSetting = 0).count())
    // recall parity vs exact — the sample-trained-codebook quality check
    // (build trains on <= maxTrain hashed rows past 100 k; recall must
    // hold vs the full-corpus-trained numbers in SCALING.md)
    val exact = graft.operators.KnnSearch
      .knnExact(store.nodes, qv, 10, minSim = -2.0)
      .select(col("query_id"), col("id"))
    val got = store.searchPq(qv, k = 10, strengthSetting = 0)
      .select(col("query_id").as("gq"), col("id").as("gid"))
    val inter = exact.join(got,
      exact("query_id") === got("gq") && exact("id") === got("gid"))
      .count()
    val recall = inter.toDouble / exact.count()

    println(s"""{"n":$n,"delta":$dDelta,"dim":$dim,""" +
      s""""load_sec":$tLoad,""" +
      s""""pq_build_sec":$tPqBuild,"pq_append_sec":$tPqAppend,""" +
      s""""pq_delta_qe_micro":${pqStats.deltaStatMicro},""" +
      s""""pq_build_qe_micro":${pqStats.buildStatMicro},""" +
      s""""pq_retrain":${pqStats.retrainRecommended},""" +
      s""""sq_build_sec":$tSqBuild,"sq_append_sec":$tSqAppend,""" +
      s""""sq_oob_micro":${sqStats.deltaStatMicro},""" +
      s""""bq_build_sec":$tBqBuild,"bq_append_sec":$tBqAppend,""" +
      s""""bq_oob_micro":${bqStats.deltaStatMicro},""" +
      s""""pq_search_sec":$tPqSearch,"pq_search_rows":$nPqHits,""" +
      s""""pq_recall10":$recall}""")
    spark.stop()
  }
}
