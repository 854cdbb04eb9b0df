package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin}

/** Edge-case semantics of the temporal join operators (the harness queries
  * q24/q25 cover the bulk path against the DuckDB oracle). */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof backward: latest at-or-before wins, equal-ts visible, no-match is null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")), // after r2 → carries r2
      (2L, 10L, ts("2024-01-01 00:00:02")), // equal ts to r2 → visible
      (3L, 10L, ts("2024-01-01 00:00:00")), // before all → null
      (4L, 99L, ts("2024-01-01 00:00:10"))  // other key, no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:01"), 1.0),
      (102L, 10L, ts("2024-01-01 00:00:02"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts",
        tieCol = "event_id", rightValCols = Seq("event_id", "value"),
        asofPrefix = "r_")
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(102L), 2L -> Some(102L),
      3L -> None, 4L -> None))
  }

  test("asof forward: earliest at-or-after wins, equal-ts visible, " +
      "min-tie on equal time, no-match is null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before both → carries r101
      (2L, 10L, ts("2024-01-01 00:00:02")), // equal ts to r102 → visible
      (3L, 10L, ts("2024-01-01 00:00:05")), // after all → null
      (4L, 99L, ts("2024-01-01 00:00:00"))  // other key → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:01"), 1.0),
      (102L, 10L, ts("2024-01-01 00:00:02"), 2.0),
      (100L, 10L, ts("2024-01-01 00:00:02"), 3.0) // equal-ts tie → min id
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.forward(left, right, Seq("user_id"), "ts",
        tieCol = "event_id", rightValCols = Seq("event_id", "value"),
        asofPrefix = "r_")
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === Map(1L -> Some(101L), 2L -> Some(100L),
      3L -> None, 4L -> None))
  }

  test("asof tolerance: out-of-window carries null; both directions") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:10:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:00"), 1.0),  // 600 s before
      (102L, 10L, ts("2024-01-01 00:30:00"), 2.0))  // 1200 s after
      .toDF("event_id", "user_id", "ts", "value")
    def one(df: org.apache.spark.sql.DataFrame) =
      df.select("r_event_id", "r_value")
        .as[(Option[Long], Option[Double])].head()
    // backward within 600 s: the 600-s-old row is exactly at the bound
    assert(one(AsOfJoin.backward(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "value"), "r_",
      toleranceSec = Some(600L))) === ((Some(101L), Some(1.0))))
    // backward within 599 s: out of window — BOTH carried columns null
    assert(one(AsOfJoin.backward(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "value"), "r_",
      toleranceSec = Some(599L))) === ((None, None)))
    // forward within 1200 s / 1199 s: same at the other bound
    assert(one(AsOfJoin.forward(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "value"), "r_",
      toleranceSec = Some(1200L))) === ((Some(102L), Some(2.0))))
    assert(one(AsOfJoin.forward(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id", "value"), "r_",
      toleranceSec = Some(1199L))) === ((None, None)))
  }

  test("asof backward: NULL-time right rows precede nothing (SQL comparison semantics)") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:05")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, Option.empty[Timestamp], 1.0), // undated → never carried
      (102L, 10L, Some(ts("2024-01-01 00:00:01")), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts",
        "event_id", Seq("event_id"), "r_")
      .select("r_event_id").as[Option[Long]].head()
    assert(got === Some(102L))
  }

  test("asof: NULL-time LEFT rows carry nothing in both directions") {
    // `NULL <= t` / `NULL >= t` is NULL under SQL comparison semantics —
    // an undated left row must never attach a right row. Forward is the
    // regression case: plain `desc` sorts NULLs LAST, which would scan the
    // NULL-time left row after the whole group and attach the key's
    // earliest right row.
    val left = Seq(
      (1L, 10L, Option.empty[Timestamp]),           // undated → null carry
      (2L, 10L, Some(ts("2024-01-01 00:00:02")))    // dated control row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, 10L, ts("2024-01-01 00:00:01"), 1.0),
      (102L, 10L, ts("2024-01-01 00:00:03"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Seq[String], String, String, Seq[String], String,
        Option[Long]) => org.apache.spark.sql.DataFrame) =
      f(left, right, Seq("user_id"), "ts", "event_id",
        Seq("event_id", "value"), "r_", None)
        .select("event_id", "r_event_id")
        .as[(Long, Option[Long])].collect().toMap
    assert(run(AsOfJoin.backward) ===
      Map(1L -> None, 2L -> Some(101L)))
    assert(run(AsOfJoin.forward) ===
      Map(1L -> None, 2L -> Some(102L)))
  }

  test("asof backward: equal-time right rows resolve by tie column (max wins)") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:01:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, 5L, ts("2024-01-01 00:00:30"), 0.0),
      (9L, 5L, ts("2024-01-01 00:00:30"), 0.0), // same ts, higher tie
      (8L, 5L, ts("2024-01-01 00:00:10"), 0.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts",
        "event_id", Seq("event_id"), "r_")
      .select("r_event_id").as[Long].head()
    assert(got === 9L)
  }

  test("range banded: inclusive band endpoints, bucket boundaries crossed") {
    // width = 60 s band [0, 60]; rows land in different buckets on purpose
    val base = ts("2024-01-01 00:00:59") // bucket edge at :00/:60
    val left = Seq((1L, 5L, base)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 5L, ts("2024-01-01 00:00:59")),  // +0 s → in (inclusive lower)
      (11L, 5L, ts("2024-01-01 00:01:59")),  // +60 s → in (inclusive upper)
      (12L, 5L, ts("2024-01-01 00:02:00")),  // +61 s → out
      (13L, 5L, ts("2024-01-01 00:00:58")),  // −1 s → out (backward)
      (14L, 6L, ts("2024-01-01 00:01:00"))   // wrong key → out
    ).toDF("event_id", "user_id", "ts")
    val got = RangeJoin.banded(left, right, Seq("user_id"), "ts", 0, 60)
      .select("r_event_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(10L, 11L))
  }

  test("range banded: negative lower bound looks backward") {
    val left = Seq((1L, 5L, ts("2024-01-01 00:10:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 5L, ts("2024-01-01 00:09:30")), // −30 s → in for [−60, 0]
      (11L, 5L, ts("2024-01-01 00:10:30"))  // +30 s → out
    ).toDF("event_id", "user_id", "ts")
    val got = RangeJoin.banded(left, right, Seq("user_id"), "ts", -60, 0)
      .select("r_event_id").as[Long].collect().toSeq
    assert(got === Seq(10L))
  }

  test("asof plan: single shuffle on keys, no join node at all") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:00:05")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((101L, 10L, ts("2024-01-01 00:00:01"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val plan = AsOfJoin.backward(left, right, Seq("user_id"), "ts",
      "event_id", Seq("event_id"), "r_")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
  }

  test("range plan: equi hash join, not broadcast nested loop") {
    val ev = Tables.events(spark, sf001)
    val l = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val r = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val plan = RangeJoin.banded(l, r, Seq("user_id"), "ts", 0, 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"banded range join must stay an equi-join:\n$plan")
  }
}
