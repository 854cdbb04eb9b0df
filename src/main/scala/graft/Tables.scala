package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated testdata layout (one parquet per table,
  * see /root/repo/TESTDATA.md). All engine operators are DataFrame-in /
  * DataFrame-out; these helpers only exist for the query harness.
  *
  * The testdata stores timestamps as parquet TIMESTAMP(NANOS), which Spark
  * has no native type for — we read them as nano longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to micros
  * timestamps here, so queries see plain TimestampType (UTC, matching the
  * DuckDB oracle's TIMESTAMP_NS → TIMESTAMP cast).
  */
object Tables {
  private val tsColumns = Set("l_shipdate", "o_orderdate", "ts")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (tsColumns.contains(f.name) && f.dataType == LongType)
        df.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else df
    }
  }

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
