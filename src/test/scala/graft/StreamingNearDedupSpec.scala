package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{NearDupOut, StreamingNearDedup}

/** transformWithState embedding near-dup: representatives persist across
  * micro-batches, any-band fold flags dups, the rep cap bounds state. */
class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  // 2 bands × 2 bits of axis-aligned planes: bucket = sign pattern
  private val anchors = Seq(
    Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f)),
    Seq(Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f)))

  private def withRocksDb[A](f: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("scaled clones match their representative across batches; " +
      "bucket-mates below tau register as their own reps") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val stream = MemoryStream[(Long, Array[Float])]
      val q = StreamingNearDedup.dedupNear(
          stream.toDF().toDF("doc_id", "vector"), anchors, tau = 0.9)
        .writeStream.outputMode("append")
        .format("memory").queryName("neardup_out").start()
      try {
        def byDoc() = spark.table("neardup_out").as[NearDupOut].collect()
          .groupBy(_.doc_id).view
          .mapValues(_.map(_.matched_rep).max).toMap

        // batch 0: A registers; A2 = 2×A matches A in every band;
        // C shares A's band-0 bucket but cos(A,C)=0 → own rep
        stream.addData(
          (1L, Array(1f, 1f, 1f, 1f)),
          (2L, Array(2f, 2f, 2f, 2f)),
          (5L, Array(1f, 1f, -1f, -1f)))
        q.processAllAvailable()
        assert(byDoc()(1L) === -1L, "first arrival is the rep")
        assert(byDoc()(2L) === 1L, "scaled clone matches the rep")
        assert(byDoc()(5L) === -1L, "orthogonal bucket-mate is no dup")

        // batch 1: reps persisted — 3×A matches A; 2×C matches C
        // (C DID register in batch 0 since it matched nothing);
        // an antipodal vector lands in fresh buckets, no match
        stream.addData(
          (7L, Array(3f, 3f, 3f, 3f)),
          (8L, Array(2f, 2f, -2f, -2f)),
          (9L, Array(-1f, -1f, -1f, -1f)))
        q.processAllAvailable()
        assert(byDoc()(7L) === 1L)
        assert(byDoc()(8L) === 5L)
        assert(byDoc()(9L) === -1L)
      } finally q.stop()
    }
  }

  test("maxReps caps per-bucket state: beyond the cap, non-matching " +
      "arrivals do not register (recall degrades, state stays bounded)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    // one band, one bit: every +x vector shares a single bucket
    val oneBucket = Seq(Seq(Array(1f, 0f, 0f, 0f)))
    def run(maxReps: Int, name: String): Map[Long, Long] = withRocksDb {
      val stream = MemoryStream[(Long, Array[Float])]
      val q = StreamingNearDedup.dedupNear(
          stream.toDF().toDF("doc_id", "vector"), oneBucket,
          tau = 0.9, maxReps = maxReps)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // A is the rep; B shares the bucket but cos(A,B)≈0.59 < τ;
        // B2 = 2×B matches ONLY if B managed to register
        stream.addData((1L, Array(1f, 0f, 0f, 0f)))
        q.processAllAvailable()
        stream.addData((2L, Array(1f, 5f, 0f, 0f)))
        q.processAllAvailable()
        stream.addData((3L, Array(2f, 10f, 0f, 0f)))
        q.processAllAvailable()
        spark.table(name).as[NearDupOut].collect()
          .groupBy(_.doc_id).view.mapValues(_.map(_.matched_rep).max).toMap
      } finally q.stop()
    }
    val capped = run(maxReps = 1, "neardup_cap1")
    assert(capped === Map(1L -> -1L, 2L -> -1L, 3L -> -1L),
      "cap=1: B never registered, so B2 goes unmatched")
    val roomy = run(maxReps = 4, "neardup_cap4")
    assert(roomy === Map(1L -> -1L, 2L -> -1L, 3L -> 2L),
      "cap=4: B registered, B2 matches it")
  }
}
