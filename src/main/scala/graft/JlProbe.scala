package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{KnnSearch, RandomProjection}

/** Manual scale probe for the JL random projection (not part of the
  * driver harness): does projecting 64 → 16 dims before exact search
  * actually buy wall-clock at scale, and what recall does it keep on
  * clustered data? Usage: `sbt "runMain graft.JlProbe 200000 64 16"`. */
object JlProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val outDim = if (args.length > 2) args(2).toInt else 16
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
    val queries = nodes.filter(col("id") % math.max(1L, n / 100) === 0)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()

    val (exact, tExact) = timed {
      KnnSearch.knnExact(nodes, queries, 10, minSim = -2.0)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val (projNodes, tProject) = timed {
      RandomProjection.project(nodes, seed = 41L, outDim, dim)
        .withColumn("deleted", lit(false)).localCheckpoint()
    }
    val projQueries = RandomProjection.project(
      queries.select(col("query_id").as("id"),
        col("query_vec").as("vector")), seed = 41L, outDim, dim)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
    val (projHits, tProjSearch) = timed {
      KnnSearch.knnExact(projNodes, projQueries, 10, minSim = -2.0)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val recall = projHits.count(exact.contains).toDouble / exact.size
    // the serving shape: projected scan proposes a shortlist, the true
    // kernel re-ranks only those rows on the raw vectors (the BQ/SQ
    // rerank-tail pattern)
    val (rrHits, tRerank) = timed {
      import org.apache.spark.sql.expressions.Window
      val cand = KnnSearch.knnExact(projNodes, projQueries, 100,
        minSim = -2.0).select(col("query_id"), col("id"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("id").asc)
      cand.join(nodes.select(col("id"), col("vector")), Seq("id"))
        .join(queries, Seq("query_id"))
        .withColumn("score", graft.functions.VectorFunctions.cosineSim(
          col("query_vec"), col("vector")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val rrRecall = rrHits.count(exact.contains).toDouble / exact.size
    println(f"[jlprobe] n=$n dim=$dim->$outDim " +
      f"exact=${tExact}%.1fs project=${tProject}%.1fs " +
      f"projSearch=${tProjSearch}%.1fs recall@10=${recall}%.3f " +
      f"rerank@100=${tRerank}%.1fs recall=${rrRecall}%.3f")
    spark.stop()
  }
}
