package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SessionEvent, StatefulSessionize}

class StatefulSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, sec: Int) =
    SessionEvent(u, new Timestamp(sec * 1000L), "click")

  test("flatMapGroupsWithState closes sessions on gaps, keeps state across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val q = StatefulSessionize.sessions(stream.toDS(), gapMs = 30000L,
      timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 0: user 1 has two events 5s apart (one session so far);
      // user 2 one event
      stream.addData(ev(1, 0), ev(1, 5), ev(2, 100))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // nothing closed yet

      // batch 1: user 1 returns 10 min later → previous session closes
      stream.addData(ev(1, 600))
      q.processAllAvailable()
      val closed = spark.table("sess_out")
        .as[graft.streaming.SessionOut].collect().toList
      assert(closed.map(c => (c.user_id, c.start_ts, c.end_ts, c.n_events,
        c.closed_by)) === List((1L, 0L, 5000L, 2L, "gap")))
    } finally q.stop()
  }

  test("transformWithState v2: gap closure AND event-time timer closure " +
      "off the watermark clock") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[SessionEvent]
      val q = graft.streaming.StatefulSessionizeV2
        .sessions(stream.toDS(), gapMs = 30000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_v2_out").start()
      try {
        def rows() = spark.table("sess_v2_out")
          .as[graft.streaming.SessionOut].collect().toList
          .map(c => (c.user_id, c.start_ts, c.end_ts, c.n_events, c.closed_by))

        // batch 0: user 1 two events 5s apart — one open session, a timer
        // armed at 45s event time; watermark still behind it → no output.
        // (times start at 10s, not 0: the initial watermark is 0 and
        // event-time mode drops rows at-or-before it as late)
        stream.addData(ev(1, 10), ev(1, 15))
        q.processAllAvailable()
        assert(rows() === Nil)

        // batch 1: user 2 appears at t=100 → watermark advances past 45s,
        // so user 1's idle session must close FROM THE TIMER (no user-1
        // event arrived); user 2's own session stays open
        stream.addData(ev(2, 100))
        q.processAllAvailable()
        // the watermark that fires the timer is committed at the NEXT
        // batch boundary; an empty nudge batch lets it propagate
        stream.addData(ev(2, 101))
        q.processAllAvailable()
        assert(rows() === List((1L, 10000L, 15000L, 2L, "timer")))

        // batch 2: user 2 returns 10 min later → the previous session
        // closes from the GAP path, same semantics as v1
        stream.addData(ev(2, 700))
        q.processAllAvailable()
        assert(rows().toSet === Set(
          (1L, 10000L, 15000L, 2L, "timer"),
          (2L, 100000L, 101000L, 2L, "gap")))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
