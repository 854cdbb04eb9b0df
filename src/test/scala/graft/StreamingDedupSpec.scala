package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TTLConfig
import graft.streaming.{DedupIn, DedupOut, StreamingDedup}

/** transformWithState (state v2) streaming dedup: first occurrence passes,
  * re-encounters are suppressed and counted across micro-batches. Needs the
  * RocksDB state store provider — set per-query via the session conf. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState dedup suppresses cross-batch duplicates") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[DedupIn]
      val q = StreamingDedup.dedup(stream.toDS(), TTLConfig.NONE)
        .writeStream.outputMode("append")
        .format("memory").queryName("dedup_out").start()
      try {
        // batch 0: h1 twice (one in-batch dup), h2 once
        stream.addData(DedupIn(3L, "h1"), DedupIn(7L, "h1"), DedupIn(5L, "h2"))
        q.processAllAvailable()
        val b0 = spark.table("dedup_out").as[DedupOut].collect()
          .map(o => (o.content_hash, o.doc_id, o.n_dropped, o.first_seen))
          .sortBy(_._1)
        assert(b0.toSeq === Seq(("h1", 3L, 1L, true), ("h2", 5L, 0L, true)))

        // batch 1: h1 again (cross-batch dup) + fresh h3
        stream.addData(DedupIn(9L, "h1"), DedupIn(2L, "h3"))
        q.processAllAvailable()
        val all = spark.table("dedup_out").as[DedupOut].collect()
          .map(o => (o.content_hash, o.doc_id, o.n_dropped, o.first_seen))
          .sortBy(r => (r._1, r._4))
        assert(all.toSeq === Seq(
          ("h1", 9L, 2L, false),  // suppressed, running dropped count
          ("h1", 3L, 1L, true),
          ("h2", 5L, 0L, true),
          ("h3", 2L, 0L, true)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("a non-NONE TTL starts and dedups (ProcessingTime time mode)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[DedupIn]
      stream.addData(DedupIn(1L, "h1"), DedupIn(2L, "h1"))
      // regression: TTL + TimeMode.None threw at query start; dedup() must
      // switch to ProcessingTime when a TTL is configured. AvailableNow
      // (not processAllAvailable) because processing-time semantics keep
      // the engine triggering batches — the query must terminate itself.
      val q = StreamingDedup.dedup(stream.toDS(),
          TTLConfig(java.time.Duration.ofHours(1)))
        .writeStream.outputMode("append")
        .format("memory").queryName("dedup_ttl_out").start()
      try {
        // poll, don't await: processing-time semantics keep the engine
        // triggering batches, so neither processAllAvailable nor
        // AvailableNow termination ever settles (NOTES gotcha)
        val deadline = System.nanoTime() + 120e9.toLong
        def rows() = spark.table("dedup_ttl_out").as[DedupOut].collect()
        while (rows().isEmpty && System.nanoTime() < deadline)
          Thread.sleep(200)
        assert(q.exception.isEmpty, s"query failed: ${q.exception}")
        assert(rows().toSeq === Seq(DedupOut(1L, "h1", 1L, first_seen = true)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("dropDuplicatesWithinWatermark: built-in bounded-state dedup") {
    // the built-in complement to the custom transformWithState path:
    // duplicates suppressed while within the watermark horizon, state
    // evicted beyond it (exactly-once only within the horizon — the
    // documented trade for bounded state at scale)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val stream = MemoryStream[Evt]
    val dd = stream.toDF()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_type")
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName("ddww_out").start()
    try {
      def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
      stream.addData(Evt(t(1), "click", 1.0), Evt(t(2), "click", 2.0),
        Evt(t(3), "view", 3.0))
      q.processAllAvailable()
      val n1 = spark.table("ddww_out").count()
      assert(n1 === 2, s"in-horizon duplicate not suppressed: $n1 rows")
      // jump far past the horizon: the click key re-admits
      stream.addData(Evt(t(100), "click", 4.0))
      q.processAllAvailable()
      stream.addData(Evt(t(130), "click", 5.0))
      q.processAllAvailable()
      val types = spark.table("ddww_out")
        .groupBy(col("event_type")).count()
        .as[(String, Long)].collect().toMap
      assert(types("click") >= 2,
        s"key must re-admit after watermark eviction: $types")
    } finally q.stop()
  }
}
