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
    store.buildPqIndex()
    store.buildSqIndex()
    val qv = nodes.filter(col("id") % (n / 20) === 3).limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()

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
