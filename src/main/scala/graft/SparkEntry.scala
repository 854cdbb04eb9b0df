package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registries live in `graft.queries.*`; this object only merges them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact batch kNN — the reference's `searchAstroDB` semantics
    * (driver/driver.ts:290-307) over the embeddings fixture. */
  def entry(spark: SparkSession): DataFrame =
    queries("v01_knn_exact")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++ TextQueries.queries ++ AnnQueries.queries ++ MultimodalQueries.queries ++ AnalyticQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ VectorQueries.oracleSql ++ TextQueries.oracleSql ++ AnnQueries.oracleSql ++ MultimodalQueries.oracleSql ++ AnalyticQueries.oracleSql
}
