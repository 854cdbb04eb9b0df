package graft

import org.apache.spark.sql.functions._

/** Storage-layout scale techniques: partition pruning (read only the
  * partitions a filter names) and bucketed tables (co-partitioned joins
  * with NO exchange on either side) — the layouts a 100 TB deployment uses
  * to keep the big joins shuffle-free. */
class StorageLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet: filters become PartitionFilters (pruned scan)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.lineitem(spark, sf001)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val df = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    // the data filter list must NOT need the partition column
    assert(!plan.contains("PushedFilters: [IsNotNull(l_returnflag"), plan)
  }

  test("bucketed tables join without any shuffle on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      assert(wh.nonEmpty)
      Tables.orders(spark, sf001)
        .write.mode("overwrite").bucketBy(4, "o_custkey")
        .sortBy("o_custkey").saveAsTable("orders_b")
      Tables.customer(spark, sf001)
        .write.mode("overwrite").bucketBy(4, "c_custkey")
        .sortBy("c_custkey").saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      joined.collect()
      val full = joined.queryExecution.executedPlan.toString
      // AQE string repeats the initial plan; grade only the final section
      val plan = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i => full.substring(0, i)
      }
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // bucket co-partitioning satisfies the join's distribution: the ONLY
      // exchange is the final small aggregation shuffle, never a join input
      val nExchanges = "Exchange hashpartitioning".r
        .findAllMatchIn(plan).length
      assert(nExchanges === 1, s"expected only the agg exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
