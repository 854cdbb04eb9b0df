package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sf001)
    .select("l_orderkey", "l_extendedprice")
  private lazy val dim = Tables.orders(spark, sf001)
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey", "o_orderstatus")

  test("pruned join result equals the plain join (no false negatives)") {
    val pruned = BloomPrune.prunedEquiJoin(li, dim, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "l_extendedprice", "o_orderstatus")
      .as[(Long, Double, String)].collect().sorted
    val plain = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .select("l_orderkey", "l_extendedprice", "o_orderstatus")
      .as[(Long, Double, String)].collect().sorted
    assert(pruned.length > 0)
    assert(pruned.toSeq === plain.toSeq)
  }

  test("the membership filter sits on the fact side before the join") {
    val df = BloomPrune.prunedEquiJoin(li, dim, "l_orderkey", "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.toString.contains("might_contain"),
      s"expected bloom membership filter in plan:\n$plan")
  }

  test("string keys prune correctly (both sides hash through xxhash64)") {
    val factS = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val dimS = Seq(("1-URGENT", 1), ("3-MEDIUM", 3))
      .toDF("prio", "rank_no")
    val got = BloomPrune.prunedEquiJoin(factS, dimS,
        "o_orderpriority", "prio")
      .select("o_orderkey", "rank_no").as[(Long, Int)].collect().sorted
    val plain = factS.join(dimS, factS("o_orderpriority") === dimS("prio"))
      .select("o_orderkey", "rank_no").as[(Long, Int)].collect().sorted
    assert(got.length > 0)
    assert(got.toSeq === plain.toSeq)
  }

  test("prune keeps selectivity: surviving rows well below fact count") {
    BloomPrune.registerMightContain(li)
    val bytes = BloomPrune.buildFilter(dim, "o_orderkey",
      math.max(dim.count(), 1), 0.01)
    val kept = li.filter(
      BloomPrune.mightContain(bytes, col("l_orderkey"))).count()
    val total = li.count()
    val trueMatch = li.join(dim.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    assert(kept >= trueMatch) // no false negatives
    // false positives bounded: kept ≤ true + fpp-slack on the non-matching
    assert(kept <= trueMatch + math.ceil((total - trueMatch) * 0.05).toLong,
      s"kept=$kept trueMatch=$trueMatch total=$total")
  }
}
