package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Manual scale probe for the temporal joins (not part of the driver
  * harness): deterministic synthetic event stream at arbitrary N — evidence
  * for the SCALING.md claims that as-of stays one linear shuffle and the
  * banded range join stays an equi-join as N grows far beyond the fixtures.
  *
  * Usage: `sbt "runMain graft.TemporalProbe 2000000 5000"` (rows, users).
  */
object TemporalProbe {

  def syntheticEvents(spark: SparkSession, n: Long, users: Int): DataFrame =
    spark.range(n).select(
      col("id").as("event_id"),
      pmod(hash(col("id"), lit(1)), lit(users)).cast("long").as("user_id"),
      timestamp_micros(lit(1704067200000000L) // 2024-01-01
        + col("id") * 250000L                 // global arrival order
        + pmod(hash(col("id"), lit(2)), lit(1000000L))).as("ts"),
      when(pmod(hash(col("id"), lit(3)), lit(10)) === 0, "error")
        .otherwise("click").as("event_type"),
      (pmod(hash(col("id"), lit(4)), lit(10000)).cast("double") / 100)
        .as("value"))

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val users = if (args.length > 1) args(1).toInt else 5000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val partitions = math.max(cpus.toInt, (n / 100000L).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val ev = syntheticEvents(spark, n, users).cache()
    ev.count() // materialize the cache — generation excluded from timings
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")

    val (nAsof, tAsof) = timed {
      AsOfJoin.backward(clicks, errors, Seq("user_id"), "ts",
        "event_id", Seq("event_id", "value"), "err_")
        .filter(col("err_event_id").isNotNull).count()
    }
    val (nRange, tRange) = timed {
      RangeJoin.banded(errors.drop("value"), clicks, Seq("user_id"), "ts",
        lowerSec = 0, upperSec = 600).count()
    }
    println(s"""{"n":$n,"users":$users,"asof_matched":$nAsof,""" +
      s""""asof_sec":$tAsof,"range_pairs":$nRange,"range_sec":$tRange}""")
    spark.stop()
  }
}
