package graft

import org.apache.spark.sql.functions._

/** The q30 bucketed-join plan contract: when both sides are bucketed on
  * the join key with equal bucket counts, the SortMergeJoin runs with no
  * exchange on either input — the write-time shuffle replaces every
  * join-time shuffle. (The join-time Sort intentionally remains: Spark 3+
  * ignores write-time sortBy order at read — SPARK-28595 — because an
  * elided sort over multi-file buckets is silently wrong; sorting
  * already-sorted runs is cheap.) */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without exchange below the SMJ") {
    val df = SparkEntry.queries("q30_bucketed_join")(spark, sf001)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the only exchange allowed is the post-join groupBy on o_orderpriority
    assert(!plan.contains("hashpartitioning(l_orderkey"),
      s"join-side shuffle present:\n$plan")
    assert(!plan.contains("hashpartitioning(o_orderkey"),
      s"join-side shuffle present:\n$plan")
    // bucketed scan engaged on both sides
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }
}
