package graft

import org.apache.spark.sql.functions._

/** The q30 bucketed-join plan contract: when both sides are bucketed AND
  * sorted on the join key with equal bucket counts, the SortMergeJoin runs
  * with no exchange and no sort on either input — the write-time shuffle
  * replaces every join-time shuffle. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed+sorted tables join without exchange or sort below the SMJ") {
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
    // sortBy at write time removes the join-time Sort: no Sort node keyed
    // on the join keys
    assert(!plan.contains("Sort [l_orderkey") && !plan.contains("Sort [o_orderkey"),
      s"join-side sort present:\n$plan")
  }
}
