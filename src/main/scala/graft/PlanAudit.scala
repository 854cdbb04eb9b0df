package graft

import org.apache.spark.sql.SparkSession

/** Dev utility for the optimization rounds: dump every declared query's
  * `.explain("formatted")` plan to a directory and print a one-line
  * shape summary (Exchange count, join strategies, cartesian products,
  * scan pushdown) so plan regressions and un-inspected bad shapes are
  * greppable in one pass. Queries that run eager driver work at plan
  * construction (walks, chunked serves) are dumped as the final
  * composed plan — the eager stages appear in their own rows' files.
  *
  * Usage: sbt "runMain graft.PlanAudit <sfDir> <outDir>"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "plans/r15/all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, s"$name.txt"), txt)
        def n(pat: String): Int = pat.r.findAllIn(txt).length
        println(f"[planaudit] $name%-28s exch=${n("Exchange")}%2d " +
          f"smj=${n("SortMergeJoin")}%2d bhj=${n("BroadcastHashJoin")}%2d " +
          f"bnl=${n("BroadcastNestedLoopJoin")}%2d " +
          f"cart=${n("CartesianProduct")}%2d")
      } catch { case e: Throwable =>
        println(s"[planaudit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
