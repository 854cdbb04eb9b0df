package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Manual scale probe for incremental index maintenance: build an index on
  * N synthetic vectors, then fold in a 1% delta via [[IndexBuild.merge]]
  * and compare against rebuilding from scratch on N+Δ — the evidence for
  * SCALING.md's claim that merge cost tracks |Δ|, not index size.
  *
  * Usage: `sbt "runMain graft.MergeProbe 100000 64"`.
  */
object MergeProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
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

    val dDelta = math.max(1L, n / 100L)
    val all = ScaleProbe.syntheticVectors(spark, n + dDelta, dim)
    val base = all.filter(col("id") < n).localCheckpoint()
    val delta = all.filter(col("id") >= n).localCheckpoint()
    val params = IndexParams(m = 16, dim = dim, levelMax = 7,
      bucketBits = math.max(4, (math.log(n / 64.0) / math.log(2)).toInt),
      nBands = 4)

    val ((bn, be), tBase) = timed {
      val r = IndexBuild.build(base, params)
      val n0 = r._1.localCheckpoint(); val e0 = r._2.localCheckpoint()
      e0.count(); (n0, e0)
    }
    val (nMergedEdges, tMerge) = timed {
      IndexBuild.merge(bn, be, delta, params)._2.count()
    }
    val (_, tRebuild) = timed {
      IndexBuild.build(all, params)._2.count()
    }

    println(s"""{"n":$n,"delta":$dDelta,"dim":$dim,""" +
      s""""base_build_sec":$tBase,"merge_sec":$tMerge,""" +
      s""""rebuild_sec":$tRebuild,""" +
      s""""merged_edges":$nMergedEdges}""")
    spark.stop()
  }
}
