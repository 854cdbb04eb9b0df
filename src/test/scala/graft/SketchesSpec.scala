package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** KMV distinct-sketch semantics beyond the q28 oracle path. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("small groups report exact counts; NULL is not a value") {
    val df = Seq(
      ("a", Some(1L)), ("a", Some(2L)), ("a", Some(2L)), ("a", None),
      ("b", Some(7L)), ("b", None)
    ).toDF("g", "v")
    val got = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .select("g", "est_distinct", "n_kept")
      .as[(String, Double, Int)].collect().sortBy(_._1)
    // below-k groups: estimate = exact distinct count, nulls excluded
    // (countDistinct semantics)
    assert(got.toSeq === Seq(("a", 2.0, 2), ("b", 1.0, 1)))
  }

  test("merging slice sketches equals sketching the whole (semigroup law)") {
    val whole = spark.range(20000).selectExpr("'g' AS g", "id AS v")
    val sliceA = whole.filter($"v" % 2 === 0)
    val sliceB = whole.filter($"v" % 2 === 1)
    val k = 128
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(sliceA, Seq("g"), "v", k)
        .unionByName(Sketches.kmvSketch(sliceB, Seq("g"), "v", k)),
      Seq("g"), k)
    val direct = Sketches.kmvSketch(whole, Seq("g"), "v", k)
    val m = merged.select("kmv").as[Seq[Double]].head()
    val d = direct.select("kmv").as[Seq[Double]].head()
    assert(m === d) // exactly: same k minima, whichever slice they came from
  }

  test("estimate is within 25% of exact on a 10k-distinct group at k=256") {
    val df = spark.range(10000).selectExpr("'g' AS g", "id AS v")
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 256)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 10000) / 10000 < 0.25, s"est=$est")
  }

  test("built-in HLL++ hits its rsd bound too (the non-portable fast path)") {
    // approx_count_distinct is the right call when no cross-engine
    // verification is needed — register state is engine-internal (the
    // reason q28 uses KMV), but the estimate itself is cheap and bounded
    val df = spark.range(100000).selectExpr("id % 50000 AS v")
    val est = df.agg(approx_count_distinct(col("v"), rsd = 0.02))
      .as[Long].head()
    assert(math.abs(est - 50000.0) / 50000 < 0.1, s"est=$est")
  }

  test("heavyHitters: exact output equal to the full groupBy answer, " +
      "invariant to partitioning, empty when nothing clears the share") {
    import org.apache.spark.sql.functions._
    val toks = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val n = toks.count()
    val shareMicro = 2000L // 0.2%
    val minCount = (n * shareMicro + 999999L) / 1000000L
    val exact = toks.groupBy("token").count()
      .filter(col("count") >= minCount)
      .as[(String, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should have 0.2% tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.heavyHitters(df, "token", shareMicro)
        .as[(String, Long)].collect().toSet
    assert(run(toks) === exact)
    assert(run(toks.repartition(17)) === exact)
    assert(run(toks.repartition(1)) === exact)
    // nothing clears 60%: empty, not an error
    assert(Sketches.heavyHitters(toks, "token", 600000L).isEmpty)
    // boundary: a key at EXACTLY the threshold is kept (>= contract)
    val tiny = (Seq.fill(2)("hot") ++ Seq("a", "b")).toDF("k")
    // n=4, share 500000 micro -> minCount = 2; "hot" has exactly 2
    assert(Sketches.heavyHitters(tiny, "k", 500000L)
      .as[(String, Long)].collect().toSet === Set(("hot", 2L)))
  }
}
