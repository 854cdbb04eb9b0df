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
}
