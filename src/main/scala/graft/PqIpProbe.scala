package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, KnnSearch, PqIndex}

/** Focused A/B of the residual-PQ shortlist metric at scale: euclidean
  * residual ADC vs the cosine-consistent IP+norm estimate, identical
  * artifacts and probe budgets, recall@10 vs the cosine exact truth.
  * The r14 flagship measured the IP default at 0.345 where r13's
  * euclidean deep serve measured 0.765 — this probe isolates whether
  * the shortlist RANKING (not the facade plumbing) is responsible.
  * Usage: `tools/runmain.sh graft.PqIpProbe 1000000 64 512 lowdim?`.
  */
object PqIpProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val cells = if (args.length > 2) args(2).toInt else 512
    val lowDim = args.length > 3 && args(3) == "lowdim"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        math.max(cpus.toInt, (n / 20000L).toInt).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val nodes = (if (lowDim) ScaleProbe.syntheticVectorsLowDim(spark, n, dim)
                 else ScaleProbe.syntheticVectors(spark, n, dim))
      .localCheckpoint()
    val queries = nodes.filter(col("id") % (n / 20) === 3).limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()
    val mSub = PqIndex.subspaces(dim)
    val subLen = dim / mSub

    // the buildPqIndex artifact chain, sample-bounded like the facade
    val maxTrain = 100000L
    val trainSet =
      if (n <= maxTrain) nodes
      else nodes.filter(pmod(xxhash64(col("id"), lit(0x5EEDL)),
        lit(1000000L)) < lit(math.ceil(
          maxTrain.toDouble / n * 1000000L).toLong))
    val (centroids, tTrain) = timed {
      val c = IvfIndex.train(trainSet, cells, iters = 3).localCheckpoint()
      c.count(); c
    }
    val asg = (if (cells > 256) IvfIndex.assignHierarchical(nodes, centroids)
               else IvfIndex.assign(nodes, centroids))
      .select(col("id"), col("cell")).localCheckpoint()
    val res = PqIndex.residuals(nodes, asg, centroids)
      .select(col("id"), col("vector")).localCheckpoint()
    val resTrain = res.join(trainSet.select(col("id")), Seq("id"),
      "left_semi")
    val rcb = PqIndex.trainCodebooks(resTrain, mSub, subLen,
      ksub = 256, iters = 1).localCheckpoint()
    val (codes, tEnc) = timed {
      val c = PqIndex.packCodesWithNorms(
        PqIndex.encode(res, rcb, mSub, subLen), nodes).localCheckpoint()
      c.count(); c
    }

    val exact = KnnSearch.knnExact(nodes, queries, 10, minSim = -2.0)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .count(exact.contains).toDouble / exact.size

    val arms = for ((short, np) <- Seq((500, 8), (5000, 32))) yield {
      val (rEu, tEu) = timed(recallOf(
        PqIndex.searchIvfPqResidualScored(nodes, codes, asg, centroids,
          rcb, queries, 10, short, np, mSub, subLen, minSim = -2.0)))
      val (rIp, tIp) = timed(recallOf(
        PqIndex.searchIvfPqResidualIpScored(nodes, codes, asg, centroids,
          rcb, queries, 10, short, np, mSub, subLen, minSim = -2.0)))
      s"""{"shortlist":$short,"n_probe":$np,""" +
        s""""euclid_recall":$rEu,"euclid_sec":$tEu,""" +
        s""""ip_recall":$rIp,"ip_sec":$tIp}"""
    }
    println(s"""{"n":$n,"dim":$dim,"cells":$cells,"lowdim":$lowDim,""" +
      s""""coarse_train_sec":$tTrain,"encode_sec":$tEnc,""" +
      s""""arms":[${arms.mkString(",")}]}""")
    spark.stop()
  }
}
