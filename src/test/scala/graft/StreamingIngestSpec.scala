package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

case class MutEvent(id: Long, vector: Seq[Float], op: String, seq: Long)

/** The FIFO single-writer queue (driver/driver.ts:24-80) as Structured
  * Streaming: batches apply in order, snapshots flip atomically. */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches apply serially; final state = sequential application") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[MutEvent]
    val statePath =
      java.nio.file.Files.createTempDirectory("graft-stream").toString
    val empty = Seq.empty[(Long, Seq[Float], Boolean)]
      .toDF("id", "vector", "deleted")

    val q = StreamingIngest.start(spark, stream.toDF(), statePath, empty)
    try {
      // batch 0: two inserts (arrival order via seq)
      stream.addData(
        MutEvent(1L, Seq(1f, 0f), "upsert", 1),
        MutEvent(2L, Seq(0f, 1f), "upsert", 2))
      q.processAllAvailable()
      // batch 1: update 1, delete 2, insert 3 — plus a same-batch
      // double-write to id 3 where the later seq must win
      stream.addData(
        MutEvent(1L, Seq(9f, 9f), "upsert", 1),
        MutEvent(2L, Seq.empty, "delete", 2),
        MutEvent(3L, Seq(0.1f, 0.1f), "upsert", 3),
        MutEvent(3L, Seq(0.2f, 0.2f), "upsert", 4))
      q.processAllAvailable()

      val state = StreamingIngest.loadState(spark, statePath).get
        .orderBy("id").as[(Long, Seq[Float], Boolean)].collect().toList
      assert(state === List(
        (1L, Seq(9f, 9f), false),
        (2L, Seq(0f, 1f), true),   // tombstoned, still present
        (3L, Seq(0.2f, 0.2f), false)))
      assert(StreamingIngest.currentVersion(spark, statePath).contains(1L))

      // the streamed state IS a VectorStore (same snapshot layout): open it
      // and search directly — stream-ingest and batch APIs share storage
      val store = VectorStore.openOrCreate(spark, statePath,
        graft.operators.IndexParams(dim = 2))
      assert(store.count() === 2) // id 2 tombstoned
      assert(store.getNode(3L).exists(_._2 === Seq(0.2f, 0.2f)))
    } finally q.stop()
  }

  test("continuous index maintenance: foreachBatch drives mergeIndex") {
    implicit val sqlCtx = spark.sqlContext
    val store = VectorStore.openOrCreate(spark,
      java.nio.file.Files.createTempDirectory("graft-cont").toString,
      graft.operators.IndexParams(dim = 2, m = 4, levelMax = 1,
        bucketBits = 2, nBands = 2))
    store.addBatch(Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("id", "vector"))
    store.rebuild() // seed generation; the stream maintains it from here

    val stream = MemoryStream[MutEvent]
    val q = stream.toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = batch
          .withColumn("deleted", col("op") === "delete")
          .select(col("id"), col("vector"), col("deleted"))
        if (!delta.isEmpty) store.mergeIndex(delta)
      }
      .start()
    try {
      stream.addData(MutEvent(7L, Seq(0.9f, 0.1f), "upsert", 1))
      q.processAllAvailable()
      val hits = store.searchAnn(
          Seq((0L, Seq(1f, 0f))).toDF("query_id", "query_vec"),
          k = 3, strengthSetting = 50)
        .select("id").as[Long].collect().toSet
      assert(hits.contains(7L), s"streamed vector not indexed: $hits")

      stream.addData(MutEvent(1L, Seq(1f, 0f), "delete", 2))
      q.processAllAvailable()
      val after = store.searchAnn(
          Seq((0L, Seq(1f, 0f))).toDF("query_id", "query_vec"),
          k = 3, strengthSetting = 50)
        .select("id").as[Long].collect().toSet
      assert(!after.contains(1L), s"streamed tombstone ignored: $after")
      assert(after.contains(7L))
      assert(store.count() === 2) // 1 tombstoned; 2 and 7 live
    } finally { q.stop(); store.delete() }
  }
}
