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

  test("prune keeps selectivity: surviving rows well below fact count") {
    BloomPrune.prunedEquiJoin(li, dim, "l_orderkey", "o_orderkey") // registers fn
    val n = dim.count()
    val bf = dim.stat.bloomFilter("o_orderkey", math.max(n, 1), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val kept = li.filter(
      BloomPrune.mightContain(bos.toByteArray, col("l_orderkey"))).count()
    val total = li.count()
    val trueMatch = li.join(dim.select(col("o_orderkey").as("l_orderkey")),
      Seq("l_orderkey"), "left_semi").count()
    assert(kept >= trueMatch) // no false negatives
    // false positives bounded: kept ≤ true + fpp-slack on the non-matching
    assert(kept <= trueMatch + math.ceil((total - trueMatch) * 0.05).toLong,
      s"kept=$kept trueMatch=$trueMatch total=$total")
  }
}
