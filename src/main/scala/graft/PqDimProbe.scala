package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, KnnSearch, PqIndex}

/** Manual probe for PQ GEOMETRY at production embedding widths: the
  * reference's recommended embedder is 384-dim (`README.md:101-108`),
  * and every historical PQ measurement ran the dim-64 fixture where the
  * fixed m = 8 rule happens to equal [[PqIndex.subspaces]]'s ~8-dim-
  * subvector rule. This probe A/Bs subspace counts at ONE dim and N —
  * codebook train, encode, ADC top-k (+ exact-rerank tail) and the
  * residual IVF-PQ arm — against the euclidean exact top-10, so the
  * dim-384 rung's recall/wall trade is measured, not asserted.
  *
  * Usage: `tools/runmain.sh graft.PqDimProbe 200000 384 8,48`
  * (n, dim, comma-separated subspace counts; dim % m must be 0).
  */
object PqDimProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 384
    val ms = (if (args.length > 2) args(2)
      else s"8,${PqIndex.subspaces(dim)}")
      .split(",").map(_.toInt).toSeq.distinct
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
    val queries = nodes.filter(col("id") % math.max(1L, n / 20) === 3)
      .limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()
    val exactEuc = KnnSearch.knnExact(nodes, queries, 10, minSim = -2.0,
        metric = "euclidean")
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(r => (r.getLong(0), r.getLong(1)))
        .count(exactEuc.contains).toDouble / exactEuc.size

    // one coarse quantizer shared across geometries — the subspace split
    // is the variable under test, not the cell layout
    val kCells = math.min(1024, math.max(16, math.sqrt(n.toDouble).toInt))
    val centroids = IvfIndex.train(nodes, kCells, iters = 3)
      .localCheckpoint()
    val asg = IvfIndex.assign(nodes, centroids).localCheckpoint()
    asg.count()
    val res = PqIndex.residuals(nodes, asg, centroids)
      .select(col("id"), col("vector"))

    val arms = for (m <- ms) yield {
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val subLen = dim / m
      val ksub = 256
      val (cb, tTrain) = timed {
        val c = PqIndex.trainCodebooks(nodes, m, subLen, ksub, iters = 2)
        c.count(); c
      }
      val (codes, tEncode) = timed {
        val c = PqIndex.encode(nodes, cb, m, subLen).localCheckpoint()
        c.count(); c
      }
      val (adcRows, tAdc) = timed(
        PqIndex.searchAdc(codes, cb, queries, 10, m, subLen)
          .select("query_id", "id").collect())
      val (rrRows, tRerank) = timed(
        PqIndex.searchAdcRerank(nodes, codes, cb, queries, 10,
            shortlist = 1000, m, subLen)
          .select("query_id", "id").collect())
      val (rcb, tResTrain) = timed {
        val c = PqIndex.trainCodebooks(res, m, subLen, ksub, iters = 2)
        c.count(); c
      }
      val (rcodes, tResEncode) = timed {
        val c = PqIndex.encode(res, rcb, m, subLen).localCheckpoint()
        c.count(); c
      }
      val (resRows, tResSearch) = timed(
        PqIndex.searchIvfPqResidual(rcodes, asg, centroids, rcb, queries,
            10, nProbe = 8, m, subLen)
          .select("query_id", "id").collect())
      s"""{"m":$m,"sub_len":$subLen,""" +
        s""""bytes_per_vec":$m,""" +
        s""""train_sec":${f"$tTrain%.1f"},""" +
        s""""encode_sec":${f"$tEncode%.1f"},""" +
        s""""adc_sec":${f"$tAdc%.2f"},""" +
        s""""adc_recall":${recallOf(adcRows)},""" +
        s""""rerank_sec":${f"$tRerank%.2f"},""" +
        s""""rerank_recall":${recallOf(rrRows)},""" +
        s""""res_train_sec":${f"$tResTrain%.1f"},""" +
        s""""res_encode_sec":${f"$tResEncode%.1f"},""" +
        s""""res_ivfpq_sec":${f"$tResSearch%.2f"},""" +
        s""""res_ivfpq_recall":${recallOf(resRows)}}"""
    }
    println(s"""{"n":$n,"dim":$dim,"cells":$kCells,""" +
      s""""arms":[${arms.mkString(",")}]}""")
    spark.stop()
  }
}
