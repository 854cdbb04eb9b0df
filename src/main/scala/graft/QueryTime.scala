package graft

import org.apache.spark.sql.SparkSession

/** Dev utility for the optimization rounds: time individual declared
  * queries in isolation (same session shape as [[Bench]] — master and
  * shuffle partitions from `SPARK_GRAFT_CPUS`, two passes, per-pass
  * seconds printed so memo-vs-steady-state cost is visible) and dump
  * their `.explain("formatted")` plans for the plans/ evidence files.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.QueryTime <sfDir> [-explain outDir suffix] q1 q2 ..."
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (explainTo, names) = args.toList.tail match {
      case "-explain" :: out :: suffix :: rest => (Some((out, suffix)), rest)
      case rest => (None, rest)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same tuned session as the bench (see [[Bench.tunedBuilder]])
    val spark = Bench.tunedBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job wall clock with descriptions — where a query's sequential
    // jobs spend their time (scheduler-bound fixture-scale diagnosis)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (sys.env.contains("QT_JOBS")) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStarts.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description"))
              .getOrElse("")))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStarts.remove(je.jobId)
          if (st != null) println(f"[job] ${je.jobId}%4d ${(System.nanoTime() - st._1) / 1e9}%7.3f s  ${st._2}")
        }
      })
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      SparkEntry.entry(spark).count()
    } catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { pass =>
        spark.sparkContext.setJobDescription(s"$name pass $pass")
        val t0 = System.nanoTime()
        val n = try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"[querytime] $name FAILED: ${e.getMessage}"); -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[querytime] $name pass $pass: $dt%.3f s ($n rows)")
        dt
      }
      println(f"[querytime] $name min: ${times.min}%.3f s")
      explainTo.foreach { case (out, suffix) =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(out, s"${name}_$suffix.txt"), txt)
      }
    }
    spark.stop()
  }
}
