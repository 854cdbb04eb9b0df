package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{EvIn, EvOut, StreamingPatternDetect}

/** transformWithState ListState sliding window: the buffer persists
  * across micro-batches, trims to the window, and alerts exactly at the
  * threshold. */
class StreamingPatternDetectSpec extends SparkSpec {
  import spark.implicits._

  test("N-of-last-K failure alerts: buffer slides across batches, keys " +
      "are independent") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[EvIn]
      // alert when >= 2 of the last 3 events failed
      val q = StreamingPatternDetect.detect(stream.toDS(),
          window = 3, alertAt = 2)
        .writeStream.outputMode("append")
        .format("memory").queryName("pattern_out").start()
      try {
        def byEvent() = spark.table("pattern_out").as[EvOut].collect()
          .map(e => e.event_id -> ((e.source, e.fails_in_window, e.alerted)))
          .toMap

        // batch 0: srcA ok, fail, fail → alert fires on the 3rd event;
        // srcB's lone failure stays below threshold (independent buffer)
        stream.addData(
          EvIn("srcA", 1L, failed = false), EvIn("srcA", 2L, failed = true),
          EvIn("srcA", 3L, failed = true), EvIn("srcB", 4L, failed = true))
        q.processAllAvailable()
        assert(byEvent()(1L) === (("srcA", 0L, false)))
        assert(byEvent()(2L) === (("srcA", 1L, false)))
        assert(byEvent()(3L) === (("srcA", 2L, true)))
        assert(byEvent()(4L) === (("srcB", 1L, false)))

        // batch 1: srcA ok → window [fail(2), fail(3), ok(5)] still
        // alerts (2 of last 3); then another ok slides event 2 OUT →
        // [fail(3), ok(5), ok(6)] drops below threshold
        stream.addData(EvIn("srcA", 5L, failed = false))
        q.processAllAvailable()
        assert(byEvent()(5L) === (("srcA", 2L, true)))
        stream.addData(EvIn("srcA", 6L, failed = false))
        q.processAllAvailable()
        assert(byEvent()(6L) === (("srcA", 1L, false)))

        // batch 2: srcB's buffer persisted across batches too — two more
        // failures make 2-of-3 (the oldest failure slid out)
        stream.addData(EvIn("srcB", 7L, failed = false),
          EvIn("srcB", 8L, failed = true))
        q.processAllAvailable()
        assert(byEvent()(7L) === (("srcB", 1L, false)))
        assert(byEvent()(8L) === (("srcB", 2L, true)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("guards: bad window/threshold rejected") {
    intercept[IllegalArgumentException](
      new StreamingPatternDetect.PatternProcessor(3, 4))
    intercept[IllegalArgumentException](
      new StreamingPatternDetect.PatternProcessor(0, 1))
  }
}
