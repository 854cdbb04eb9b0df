package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Temporal-join + statistical-aggregate coverage (beyond the reference's
  * surface — SURVEY §2 Table B "joins"/"aggregations" rows at pipeline
  * scale): backward as-of join, banded interval join, exact percentiles,
  * and decimal-exact statistical moments.
  *
  * Float-determinism approach for the moments: all SUMS are decimal
  * (exact, order-independent); the closed-form variance/correlation
  * formulas then run in double with the same expression shape the oracle
  * uses — a single deterministic IEEE evaluation per group, no parallel
  * float accumulation anywhere.
  */
object AnalyticQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Backward as-of join: each click attributed to the user's most recent
    // error at-or-before it (argmax on (ts, event_id) — deterministic).
    "q24_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      AsOfJoin.backward(clicks, errors, Seq("user_id"), "ts",
          tieCol = "event_id", rightValCols = Seq("event_id", "value"),
          asofPrefix = "err_")
        .select(col("event_id"), col("err_event_id"), col("err_value"))
    }),

    // Banded interval join: (error, click) pairs of the same user with the
    // click 0..10 minutes after the error.
    "q25_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      RangeJoin.banded(errors, clicks, Seq("user_id"), "ts",
          lowerSec = 0, upperSec = 600)
        .select(col("l_event_id").as("err_id"),
          col("r_event_id").as("click_id"))
    }),

    // Exact linear-interpolation percentiles per group (Spark `percentile`,
    // not approx_percentile — bit-reproducible, matches quantile_cont).
    "q26_percentiles" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_quantity, 0.99)"), 6).as("p99"))
    }),

    // Statistical moments via decimal-exact sums: mean, sample variance,
    // stddev of quantity, and quantity↔discount correlation per group.
    "q27_stat_moments" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val q = col("l_quantity").cast("decimal(9,2)")
      val disc = col("l_discount").cast("decimal(9,2)")
      val agg = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(q).cast("double").as("sq"),
        sum(q * q).cast("double").as("sqq"),
        sum(disc).cast("double").as("sd"),
        sum(disc * disc).cast("double").as("sdd"),
        sum(q * disc).cast("double").as("sqd"))
      val n = col("n").cast("double")
      agg.select(
        col("l_returnflag"),
        col("n"),
        round(col("sq") / n, 6).as("mean_qty"),
        round((n * col("sqq") - col("sq") * col("sq")) / (n * (n - 1)), 6)
          .as("var_qty"),
        round(sqrt((n * col("sqq") - col("sq") * col("sq")) / (n * (n - 1))), 6)
          .as("std_qty"),
        round((n * col("sqd") - col("sq") * col("sd")) /
          (sqrt(n * col("sqq") - col("sq") * col("sq")) *
           sqrt(n * col("sdd") - col("sd") * col("sd"))), 6)
          .as("corr_qty_disc"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q24_asof_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |e AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'error'),
        |m AS (
        |  SELECT c.event_id AS click_id, e.event_id AS err_event_id,
        |    e.value AS err_value,
        |    row_number() OVER (PARTITION BY c.event_id
        |                       ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM c JOIN e ON c.user_id = e.user_id AND e.ts <= c.ts)
        |SELECT c.event_id, m.err_event_id, m.err_value
        |FROM c LEFT JOIN m ON m.click_id = c.event_id AND m.rn = 1""".stripMargin,
    "q25_range_join" ->
      """SELECT e.event_id AS err_id, c.event_id AS click_id
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        | AND e.event_type = 'error' AND c.event_type = 'click'
        | AND epoch_us(c.ts) >= epoch_us(e.ts)
        | AND epoch_us(c.ts) <= epoch_us(e.ts) + 600000000""".stripMargin,
    "q26_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_quantity, 0.99), 6) AS p99
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q27_stat_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    count(*)::BIGINT AS n,
        |    sum(l_quantity::DECIMAL(9,2))::DOUBLE AS sq,
        |    sum(l_quantity::DECIMAL(9,2) * l_quantity::DECIMAL(9,2))::DOUBLE AS sqq,
        |    sum(l_discount::DECIMAL(9,2))::DOUBLE AS sd,
        |    sum(l_discount::DECIMAL(9,2) * l_discount::DECIMAL(9,2))::DOUBLE AS sdd,
        |    sum(l_quantity::DECIMAL(9,2) * l_discount::DECIMAL(9,2))::DOUBLE AS sqd
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(sq / n, 6) AS mean_qty,
        |  round((n * sqq - sq * sq) / (n * (n - 1)), 6) AS var_qty,
        |  round(sqrt((n * sqq - sq * sq) / (n * (n - 1))), 6) AS std_qty,
        |  round((n * sqd - sq * sd) /
        |    (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)), 6)
        |    AS corr_qty_disc
        |FROM s""".stripMargin,
  )
}
