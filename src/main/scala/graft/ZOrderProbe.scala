package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual probe: does the Morton layout actually buy parquet row-group
  * pruning on EVERY clustered column (not just the leading sort key)?
  * Writes lineitem under three layouts — hash (no clustering), linear
  * sort by l_partkey, z-order over (l_partkey, l_suppkey) — then runs a
  * selective range filter on each column and reports the SCAN node's
  * output rows: with parquet min/max statistics, rows from pruned row
  * groups never leave the scan, so `scan_rows / total` IS the fraction
  * of the table the layout made the reader touch.
  * Usage: `sbt "runMain graft.ZOrderProbe /root/testdata/sf0.1"`. */
object ZOrderProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      // AQE wraps the executed plan in query stages; a plain plan keeps
      // the FileSourceScan metric reachable for the report below
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val total = li.count()
    val base = java.nio.file.Files
      .createTempDirectory("graft-zorder-probe").toString
    li.repartition(32).write.parquet(s"$base/hash")
    li.repartitionByRange(32, col("l_partkey"))
      .sortWithinPartitions("l_partkey").write.parquet(s"$base/linear")
    graft.operators.ZOrder
      .zOrderBy(li, Seq("l_partkey", "l_suppkey"), bits = 8,
        partitions = 32)
      .write.parquet(s"$base/zorder")

    val (pLo, pHi) = (1000L, 2000L)  // ~5% of l_partkey's range
    val (sLo, sHi) = (100L, 150L)    // ~5% of l_suppkey's range

    def scanRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      // metrics live on the EXECUTED df's plan — aggregate on the same
      // reference that runs (the NOTES cloned-plan trap)
      val df = spark.read.parquet(path).filter(pred)
        .agg(sum(col("l_quantity")))
      df.collect()
      val scans = df.queryExecution.executedPlan.collectLeaves()
      scans.map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L))
        .sum
    }
    def pct(n: Long): String = f"${100.0 * n / total}%.1f%%"

    val layouts = Seq("hash", "linear", "zorder")
    val onPart = layouts.map(l =>
      l -> scanRows(s"$base/$l",
        col("l_partkey").between(pLo, pHi))).toMap
    val onSupp = layouts.map(l =>
      l -> scanRows(s"$base/$l",
        col("l_suppkey").between(sLo, sHi))).toMap
    println(s"""{"total":$total,""" +
      layouts.map(l => s""""part_scan_$l":${onPart(l)}""").mkString(",") +
      "," +
      layouts.map(l => s""""supp_scan_$l":${onSupp(l)}""").mkString(",") +
      "}")
    layouts.foreach(l => println(
      s"  $l: partkey-filter scans ${pct(onPart(l))}, " +
        s"suppkey-filter scans ${pct(onSupp(l))}"))
    graft.util.Fs.deleteRecursive(spark, base)
    spark.stop()
  }
}
