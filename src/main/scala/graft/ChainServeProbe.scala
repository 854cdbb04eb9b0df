package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.IndexParams

/** Manual probe for SERVING latency through an uncompacted delta chain
  * ([[VectorStore]] graph + node chains): stream batches with
  * compaction disabled and time `searchAnnSeededIvf` at increasing
  * chain lengths — the read-side cost of the O(batch) ingest design,
  * and the evidence behind `IngestConfig.compactEvery`'s default (the
  * fold cadence trades amortized O(index/C) compaction against
  * overlay depth at serve time).
  *
  * Usage: `sbt "runMain graft.ChainServeProbe 100000 64 16"`.
  */
object ChainServeProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val maxChain = if (args.length > 2) args(2).toInt else 16
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

    val batchRows = 1000L
    val all = ScaleProbe
      .syntheticVectors(spark, n + maxChain * batchRows, dim)
      .localCheckpoint()
    val store = VectorStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-chainserve-probe"),
      IndexParams(dim = dim))
    store.addBatch(all.filter(col("id") < n))
    store.rebuild()
    store.buildPqIndex()
    val qv = all.filter(col("id") % (n / 20) === 3).limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float], String, Long)]
    val q = store.startIngest(
      stream.toDF().toDF("id", "vector", "op", "seq"),
      config = VectorStore.IngestConfig(compactEvery = 10000))
    val walls = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    // warm once, then min-of-3 timed serves: single-shot walls swing
    // ±5-10 s at deep chains from GC of the ingest batches' checkpointed
    // overlay blocks — the min is the plan's cost, the swing is ambient
    def serveWall(): Double = {
      store.searchAnnSeededIvf(qv, k = 10, strengthSetting = 0).count()
      (1 to 3).map(_ =>
        timed(store.searchAnnSeededIvf(qv, k = 10, strengthSetting = 0)
          .count())._2).min
    }
    walls += ((0, serveWall()))
    try {
      for (b <- 0 until maxChain) {
        val lo = n + b * batchRows
        stream.addData(all
          .filter(col("id") >= lo && col("id") < lo + batchRows)
          .select(col("id"), col("vector"))
          .as[(Long, Seq[Float])].collect()
          .map { case (id, v) => (id, v, "upsert", id) }.toIndexedSeq)
        q.processAllAvailable()
        if (Seq(4, 8, maxChain).contains(b + 1))
          walls += ((b + 1, serveWall()))
      }
    } finally q.stop()
    val (_, tCompact) = timed(store.compactIndex())
    val postCompact = serveWall()
    val ws = walls.map { case (k, t) => s"""[$k,${f"$t%.2f"}]""" }
      .mkString("[", ",", "]")
    println(s"""{"n":$n,"dim":$dim,"chain_serve_walls":$ws,""" +
      s""""compact_sec":${f"$tCompact%.2f"},""" +
      s""""post_compact_serve_sec":${f"$postCompact%.2f"}}""")
    spark.stop()
  }
}
