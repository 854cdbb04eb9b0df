package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator coverage over the TPC-H-ish testdata (SURVEY §2
  * Table B): scans, projection, filter, joins (inner/semi/anti/broadcast),
  * aggregation, window top-k, sort/limit, set ops, distinct.
  *
  * Oracle-determinism rules (see FIXTURES.md §Oracle notes):
  *  - double sums go through DECIMAL(18,2) so partial-aggregation order
  *    can't perturb low bits, then cast back to double;
  *  - every rank/row_number has a total order (tie-break on a key column);
  *  - column names are identical between the DataFrame and the oracle SQL.
  */
object RelationalQueries {
  private def dec(c: String) = col(c).cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: scan → filter → groupBy agg.
    // Catalyst pushes the shipdate filter + 7-column pruning to parquet.
    "q01_pricing_summary" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum((dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Projection + filter pushdown: 2 columns of 11 reach the scan.
    "q02_filter_project" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"))
    }),

    // Shuffle join orders↔customer (both large at scale) + broadcast-able
    // dim would be nation; aggregated revenue per market segment.
    "q03_revenue_by_segment" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(dec("o_totalprice")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // Multi-way join with small broadcast dims: customer→nation→region.
    "q04_customers_per_region" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(dec("c_acctbal")).cast("double").as("sum_acctbal"))
    }),

    // Window top-k per group (the reference's dominant pattern — bounded
    // top-K per entity, hnsw.ts:294-296): top-3 orders per customer.
    // Spark ≥3.5 turns this into WindowGroupLimit (running heap, no full sort).
    "q05_top_orders_per_customer" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          dec("o_totalprice").cast("double").as("o_totalprice"), col("rn"))
    }),

    // Existence joins (driver/worker.ts:14-30 add-vs-update check analog).
    "q06_customers_with_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),
    "q07_customers_without_orders" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Set ops + distinct (edge-union dedup semantics, hnsw.ts:451-456).
    "q08_union_distinct_keys" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_custkey").as("key"))
      val c = Tables.customer(s, d).select(col("c_custkey").as("key"))
      o.union(c).distinct()
    }),

    // Global sort + limit (orderBy().limit(k) → TakeOrderedAndProject:
    // per-partition top-k then driver merge, no full sort at scale).
    "q09_top20_orders" -> ((s, d) => {
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"),
          dec("o_totalprice").cast("double").as("o_totalprice"))
    }),

    // Rollup (grouping sets family).
    "q10_rollup_status_priority" -> ((s, d) => {
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("o_orderpriority"), col("n"))
    }),

    // Date/time functions over the events stream table.
    "q11_events_daily" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec("value")).cast("double").as("sum_value"))
    }),

    // String functions on part.
    "q12_part_name_stats" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"))
    }),

    // Cube (full grouping-sets family alongside q10's rollup).
    "q13_cube_events" -> ((s, d) => {
      Tables.events(s, d)
        .cube(col("event_type"), dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("dow"), col("n"))
    }),

    // Pivot: order counts per status column, one row per priority.
    "q14_pivot_status" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }),

    // INTERSECT / EXCEPT set operators on customer key sets.
    "q15_intersect_except" -> ((s, d) => {
      val withOrders = Tables.orders(s, d).select(col("o_custkey").as("key"))
      val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("key"))
      val both = withOrders.intersect(rich)
        .agg(count(lit(1)).as("n")).withColumn("which", lit("intersect"))
      val richOnly = rich.except(withOrders)
        .agg(count(lit(1)).as("n")).withColumn("which", lit("except"))
      both.unionByName(richOnly).select(col("which"), col("n"))
    }),

    // Correlated EXISTS through the SQL surface (spark.sql + temp views).
    "q16_exists_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT o_orderkey, o_orderstatus FROM orders_v o
          |WHERE EXISTS (
          |  SELECT 1 FROM lineitem_v l
          |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)""".stripMargin)
    }),

    // Math functions (sqrt/exp/ln/pow/abs/sign), rounded for oracle parity.
    "q17_math_funcs" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          round(log(col("l_quantity")), 6).as("ln_qty"),
          round(pow(col("l_tax"), 2), 6).as("tax_sq"),
          abs(col("l_quantity") - 25).cast("double").as("abs_dev"),
          signum(col("l_discount") - lit(0.05)).as("disc_sign"))
    }),

    // Array construction + aggregation into ordered arrays (serialized to
    // csv strings so the compare is representation-stable).
    "q18_array_agg" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",")
          .as("statuses"),
          countDistinct(col("l_linestatus")).as("n_statuses"))
    }),

    // Higher-order functions over the embedding arrays (order-independent
    // reductions only — element count and max need no float accumulation).
    "q19_higher_order" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          round(array_max(col("embedding")).cast("double"), 6).as("max_elem"),
          size(col("embedding")).as("dim"))
    }),

    // Source/sink format coverage: documents round-trip through json and
    // csv sinks and come back identical in count and key cardinality.
    "q23_source_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        col("source"), col("n_chars"))
      // fixed path + overwrite: no temp-dir leak per run. Driver-local
      // tmp is fine here — the harness runs local[N]; a cluster deployment
      // would point this at a shared filesystem path.
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-roundtrip"
      docs.write.mode("overwrite").json(s"$base/json")
      docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      docs.write.mode("overwrite").orc(s"$base/orc")
      val fromJson = s.read.json(s"$base/json")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("fmt", lit("json"))
      val fromCsv = s.read.option("header", "true")
        .option("inferSchema", "true").csv(s"$base/csv")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("fmt", lit("csv"))
      val fromOrc = s.read.orc(s"$base/orc")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("fmt", lit("orc"))
      fromJson.unionByName(fromCsv).unionByName(fromOrc)
        .select(col("fmt"), col("n_rows"), col("n_langs"))
    }),

    // Gap-based sessionization via window lag: a new session starts after
    // a >30 min silence; #sessions = #session starts. Gaps compare in
    // microseconds (unix_micros ↔ DuckDB epoch_us — both truncate the
    // source nanos identically).
    "q22_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1)
            .otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }),

    // JSON functions over the events props column.
    "q21_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(lit(1)).as("n"))
    }),

    // Wider string-function coverage on customer names.
    "q20_string_funcs" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          instr(col("c_name"), "0").as("first_zero"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'",
    "q03_revenue_by_segment" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_customers_per_region" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q05_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(rn AS INT) AS rn
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "q06_customers_with_orders" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    "q07_customers_without_orders" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
    "q08_union_distinct_keys" ->
      "SELECT o_custkey AS key FROM orders UNION SELECT c_custkey AS key FROM customer",
    "q09_top20_orders" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q10_rollup_status_priority" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q11_events_daily" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q12_part_name_stats" ->
      """SELECT p_partkey, upper(p_brand) AS brand_upper,
        |  length(p_name) AS name_len,
        |  substring(p_type, 1, 5) AS type_prefix
        |FROM part""".stripMargin,
    "q13_cube_events" ->
      """SELECT event_type, dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
        |  count(*) AS n
        |FROM events GROUP BY CUBE (event_type, dow)""".stripMargin,
    "q14_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q15_intersect_except" ->
      """WITH wo AS (SELECT o_custkey AS key FROM orders),
        |rich AS (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000)
        |SELECT 'intersect' AS which, count(*) AS n FROM (SELECT key FROM wo INTERSECT SELECT key FROM rich)
        |UNION ALL
        |SELECT 'except' AS which, count(*) AS n FROM (SELECT key FROM rich EXCEPT SELECT key FROM wo)""".stripMargin,
    "q16_exists_subquery" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)""".stripMargin,
    "q17_math_funcs" ->
      """SELECT l_orderkey,
        |  round(sqrt(l_quantity), 6) AS sqrt_qty,
        |  round(exp(l_discount), 6) AS exp_disc,
        |  round(ln(l_quantity), 6) AS ln_qty,
        |  round(pow(l_tax, 2), 6) AS tax_sq,
        |  CAST(abs(l_quantity - 25) AS DOUBLE) AS abs_dev,
        |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |       WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS disc_sign
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,
    "q18_array_agg" ->
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
        |  count(DISTINCT l_linestatus) AS n_statuses
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q19_higher_order" ->
      """SELECT vec_id,
        |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
        |  round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem,
        |  len(embedding) AS dim
        |FROM embeddings""".stripMargin,
    "q23_source_roundtrip" ->
      """SELECT fmt, count(*) AS n_rows, count(DISTINCT lang) AS n_langs
        |FROM (SELECT 'json' AS fmt, lang FROM documents
        |      UNION ALL SELECT 'csv' AS fmt, lang FROM documents
        |      UNION ALL SELECT 'orc' AS fmt, lang FROM documents)
        |GROUP BY fmt""".stripMargin,
    "q22_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev IS NULL
        |    OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM e GROUP BY user_id""".stripMargin,
    "q21_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q20_string_funcs" ->
      """SELECT c_custkey,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  reverse(c_mktsegment) AS seg_rev,
        |  strpos(c_name, '0') AS first_zero
        |FROM customer""".stripMargin,
  )
}
