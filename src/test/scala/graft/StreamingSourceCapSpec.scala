package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{CapIn, CapOut, StreamingSourceCap}

/** transformWithState MapState per-(source, day) quotas: counts persist
  * across micro-batches per day key, independent days don't interfere. */
class StreamingSourceCapSpec extends SparkSpec {
  import spark.implicits._

  test("per-source daily caps count across batches and reset per day") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[CapIn]
      val q = StreamingSourceCap.cap(stream.toDS(), maxPerSourcePerDay = 2L)
        .writeStream.outputMode("append")
        .format("memory").queryName("cap_out").start()
      try {
        def rows() = spark.table("cap_out").as[CapOut].collect().toList
          .map(c => (c.doc_id, c.source, c.day, c.src_rank, c.admitted))
          .sortBy(_._1)

        // batch 0: srcA gets 3 docs on d1 (cap 2 → third rejected),
        // srcB one doc — different key, independent counter
        stream.addData(
          CapIn(1L, "srcA", "d1"), CapIn(2L, "srcA", "d1"),
          CapIn(3L, "srcA", "d1"), CapIn(4L, "srcB", "d1"))
        q.processAllAvailable()
        assert(rows() === List(
          (1L, "srcA", "d1", 1L, true), (2L, "srcA", "d1", 2L, true),
          (3L, "srcA", "d1", 3L, false), (4L, "srcB", "d1", 1L, true)))

        // batch 1: srcA again on d1 (counter PERSISTED → rejected) and
        // on d2 (fresh day key in the same source's map → admitted)
        stream.addData(CapIn(5L, "srcA", "d1"), CapIn(6L, "srcA", "d2"))
        q.processAllAvailable()
        val later = rows().filter(_._1 >= 5L)
        assert(later === List(
          (5L, "srcA", "d1", 4L, false), (6L, "srcA", "d2", 1L, true)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("day entries evict past retainDays: state stays bounded and an " +
      "evicted day's counter re-opens") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[CapIn]
      val q = StreamingSourceCap.cap(stream.toDS(),
        maxPerSourcePerDay = 1L, retainDays = 2)
        .writeStream.outputMode("append")
        .format("memory").queryName("cap_evict").start()
      try {
        def byDoc() = spark.table("cap_evict").as[CapOut].collect()
          .map(c => c.doc_id -> (c.day, c.src_rank, c.admitted)).toMap

        // d1 fills its quota, then d2 and d3 arrive: with retainDays = 2
        // only {d2, d3} survive in the map
        stream.addData(CapIn(1L, "src", "d1"), CapIn(2L, "src", "d1"))
        q.processAllAvailable()
        stream.addData(CapIn(3L, "src", "d2"), CapIn(4L, "src", "d3"))
        q.processAllAvailable()
        assert(byDoc()(2L) === (("d1", 2L, false))) // d1 quota was spent
        // a late d1 row lands AFTER eviction: the counter re-opened at 0,
        // so it is admitted with rank 1 (the documented retainDays
        // trade-off — the horizon must cover late data); d3, still
        // retained, keeps counting from its persisted rank
        stream.addData(CapIn(5L, "src", "d1"), CapIn(6L, "src", "d3"))
        q.processAllAvailable()
        assert(byDoc()(5L) === (("d1", 1L, true)))
        assert(byDoc()(6L) === (("d3", 2L, false)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
