package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Evt(ts: Timestamp, event_type: String, value: Double)

/** Event-time windowed aggregation with watermark + late-data drop —
  * the Structured Streaming surface over the events-shaped schema. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Int) = new Timestamp(sec * 1000L)

  test("tumbling window agg with watermark drops data later than the mark") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Evt]
    val agg = stream.toDF()
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("win_out").start()
    try {
      stream.addData(Evt(t(1), "click", 1.0), Evt(t(5), "click", 2.0),
        Evt(t(12), "view", 5.0))
      q.processAllAvailable()
      // watermark is now 12s − 10s = 2s; event at t=50 advances it to 40s
      stream.addData(Evt(t(50), "click", 1.0))
      q.processAllAvailable()
      // t=3 is older than the 40s watermark minus delay → dropped
      stream.addData(Evt(t(3), "click", 100.0))
      q.processAllAvailable()

      val rows = spark.table("win_out")
        .select(col("window.start").cast("long").as("ws"),
          col("event_type"), col("n"), col("v"))
        .as[(Long, String, Long, Double)].collect()
        .groupBy(r => (r._1, r._2)).map { case (k, v) => k -> v.last }
      // first window [0,10) click: the late 100.0 never lands
      assert(rows((0L, "click"))._4 === 3.0)
      assert(rows((10L, "view"))._3 === 1L)
      assert(rows((50L, "click"))._3 === 1L)
    } finally q.stop()
  }

  test("events parquet drives the same pipeline through readStream") {
    // batch-parquet-as-stream smoke: one micro-batch over the real table
    val schema = Tables.events(spark, sf001).schema
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    Tables.events(spark, sf001).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ev_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ev_out").as[(String, Long)].collect().toMap
      val batch = Tables.events(spark, sf001)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
