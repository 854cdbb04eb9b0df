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
}
