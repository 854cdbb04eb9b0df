package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{HhIn, HhOut, StreamingHeavyHitters}

/** transformWithState MapState Misra–Gries: hot items guaranteed present
  * across batches, counters bounded at k per source, counts are lower
  * bounds on truth. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("hot items survive across batches with bounded per-source state; " +
      "counts are lower bounds; sources are independent") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[HhIn]
      // update mode — the operator's declared contract (rows are updates
      // keyed by (source, item)); the memory sink appends each batch's
      // updates, so reading it still takes latest-per-key below
      val q = StreamingHeavyHitters.track(stream.toDS(), k = 3)
        .writeStream.outputMode("update")
        .format("memory").queryName("hh_out").start()
      try {
        // batch 0: srcA: 6×hot, 5 distinct cold; srcB: 3×warm only
        stream.addData(
          (Seq.fill(6)(HhIn("srcA", "hot")) ++
            (1 to 5).map(i => HhIn("srcA", s"cold$i")) ++
            Seq.fill(3)(HhIn("srcB", "warm"))): _*)
        q.processAllAvailable()
        def latest(): Map[(String, String), (Long, Long)] =
          spark.table("hh_out").as[HhOut].collect()
            .groupBy(o => (o.source, o.item))
            // append-mode memory sink: the LAST emission per key wins
            .map { case (kk, os) =>
              kk -> { val o = os.maxBy(_.n_total); (o.mg_count, o.n_total) }
            }
        val l0 = latest()
        // the hot item is present with a lower-bound count <= truth and
        // within the MG undercount bound n/(k+1)
        val (hc, hn) = l0(("srcA", "hot"))
        assert(hn === 11L)
        assert(hc <= 6L && hc >= 6L - 11L / 4L, s"hot count $hc")
        assert(l0(("srcB", "warm"))._1 === 3L)
        // per-source candidates bounded at k
        assert(spark.table("hh_out").as[HhOut].collect()
          .groupBy(_.source).forall { case (_, os) =>
            os.groupBy(_.n_total).forall(_._2.length <= 3) })

        // batch 1: hot keeps flowing for srcA — its counter PERSISTED
        stream.addData(Seq.fill(4)(HhIn("srcA", "hot")): _*)
        q.processAllAvailable()
        val l1 = latest()
        val (hc1, hn1) = l1(("srcA", "hot"))
        assert(hn1 === 15L)
        assert(hc1 >= hc + 4L, s"persisted counter $hc1 vs $hc + 4")
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
