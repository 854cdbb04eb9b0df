package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Click(user_id: Long, click_id: Long, ts: Timestamp)
case class Err(user_id: Long, err_id: Long, ts: Timestamp)

/** Watermarked stream-stream interval join — the streaming analog of q25's
  * banded range join: each click matched to same-user errors at most 10 s
  * before it. Both sides carry watermarks so Spark can bound the join state
  * (old buffered rows are evicted once outside the interval + watermark) —
  * the property that makes the join runnable indefinitely at scale instead
  * of accumulating unbounded state. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Int) = new Timestamp(sec * 1000L)

  test("stream-stream interval join matches within the band, drops outside") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val errors = MemoryStream[Err]
    val c = clicks.toDF().withWatermark("ts", "5 seconds")
      .select(col("user_id").as("c_user"), col("click_id"),
        col("ts").as("c_ts"))
    val e = errors.toDF().withWatermark("ts", "5 seconds")
      .select(col("user_id").as("e_user"), col("err_id"), col("ts").as("e_ts"))
    val joined = c.join(e,
      col("c_user") === col("e_user") &&
        col("e_ts") <= col("c_ts") &&
        col("e_ts") >= col("c_ts") - expr("INTERVAL 10 seconds"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      errors.addData(Err(1L, 100L, t(2)), Err(1L, 101L, t(30)),
        Err(2L, 200L, t(5)))
      clicks.addData(
        Click(1L, 10L, t(8)),   // err 100 @2 within [−10, 0] → match
        Click(1L, 11L, t(20)),  // err 100 @2 is 18 s earlier → no match
        Click(2L, 20L, t(6)),   // err 200 @5 → match
        Click(3L, 30L, t(9)))   // no same-user error → no row (inner join)
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select(col("click_id"), col("err_id"))
        .as[(Long, Long)].collect().toSet
      assert(got === Set((10L, 100L), (20L, 200L)))
    } finally q.stop()
  }

  test("state is bounded: join advances watermark past stale errors") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val errors = MemoryStream[Err]
    val c = clicks.toDF().withWatermark("ts", "2 seconds")
      .select(col("user_id").as("c_user"), col("click_id"),
        col("ts").as("c_ts"))
    val e = errors.toDF().withWatermark("ts", "2 seconds")
      .select(col("user_id").as("e_user"), col("err_id"), col("ts").as("e_ts"))
    val joined = c.join(e,
      col("c_user") === col("e_user") &&
        col("e_ts") <= col("c_ts") &&
        col("e_ts") >= col("c_ts") - expr("INTERVAL 5 seconds"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_state").start()
    try {
      errors.addData(Err(1L, 100L, t(1)))
      clicks.addData(Click(1L, 10L, t(3)))
      q.processAllAvailable()
      // advance both watermarks far past the error's eviction horizon
      errors.addData(Err(1L, 101L, t(100)))
      clicks.addData(Click(1L, 11L, t(100)))
      q.processAllAvailable()
      val progress = q.lastProgress
      val stateRows = progress.stateOperators.map(_.numRowsTotal).sum
      // the t=1 error (and t=3 click) must have been evicted; only the
      // t=100 rows may remain buffered
      assert(stateRows <= 2, s"state not bounded: $stateRows rows buffered")
      val got = spark.table("ssj_state")
        .select(col("click_id"), col("err_id"))
        .as[(Long, Long)].collect().toSet
      assert(got === Set((10L, 100L), (11L, 101L)))
    } finally q.stop()
  }

  test("LEFT OUTER stream-stream join: unmatched clicks emit null-padded " +
      "rows once the watermark closes their interval") {
    // the outer variant is its own engine path: an unmatched left row
    // can only be emitted when the watermark PROVES no future right row
    // can still match — the null-padded result arrives late by design
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val errors = MemoryStream[Err]
    val c = clicks.toDF().withWatermark("ts", "2 seconds")
      .select(col("user_id").as("c_user"), col("click_id"),
        col("ts").as("c_ts"))
    val e = errors.toDF().withWatermark("ts", "2 seconds")
      .select(col("user_id").as("e_user"), col("err_id"), col("ts").as("e_ts"))
    val joined = c.join(e,
      col("c_user") === col("e_user") &&
        col("e_ts") <= col("c_ts") &&
        col("e_ts") >= col("c_ts") - expr("INTERVAL 5 seconds"),
      "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      errors.addData(Err(1L, 100L, t(4)))
      clicks.addData(
        Click(1L, 10L, t(6)),  // err 100 @4 in [1, 6] → matched row
        Click(2L, 20L, t(6)))  // no same-user error → outer row, LATER
      q.processAllAvailable()
      // matched row is emittable immediately; the outer row is NOT yet
      // (a future error at ts ≤ 6 could still arrive)
      val early = spark.table("ssj_outer")
        .select(col("click_id"), col("err_id"))
        .as[(Long, Option[Long])].collect().toSet
      assert(early === Set((10L, Some(100L))))
      // advance the watermark far past click 20's interval → the engine
      // can prove no match is coming and emits the null-padded row
      errors.addData(Err(9L, 900L, t(100)))
      clicks.addData(Click(9L, 90L, t(100)))
      q.processAllAvailable()
      clicks.addData(Click(9L, 91L, t(101))) // one more batch to flush
      q.processAllAvailable()
      val late = spark.table("ssj_outer")
        .select(col("click_id"), col("err_id"))
        .as[(Long, Option[Long])].collect().toSet
      assert(late.contains((20L, None)), s"outer row never emitted: $late")
      assert(!late.exists(r => r._1 == 10L && r._2.isEmpty),
        "matched click must not ALSO emit a null-padded row")
    } finally q.stop()
  }
}
