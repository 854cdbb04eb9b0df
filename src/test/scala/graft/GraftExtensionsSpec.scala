package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The extensions entry point injects the full function set. A second
  * SparkSession with different extensions can't be created inside this
  * shared-session test JVM, so the injection itself is exercised against a
  * fresh SparkSessionExtensions and each builder is evaluated through the
  * already-registered SQL path (same builder lambdas). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("injects all eight functions with working builders") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders enumerated below
    val fns = new GraftExtensions().functions
    assert(fns.map(_._1).sorted ===
      Seq("bloom_might_contain", "cosine_sim", "dot_product",
        "euclidean_dist", "hamming64", "pq_adc", "sq_l2", "topk_ids"))
    // builders produce resolvable expressions
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val arr = Literal.create(ArrayData.toArrayData(Array(1.0f, 0.0f)),
      ArrayType(FloatType, containsNull = false))
    val cos = fns.find(_._1 == "cosine_sim").get._3(Seq(arr, arr))
    assert(cos.eval(null) === 1.0)
  }

  test("functions resolve in plain SQL after registration") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TopKAggregate.register(spark)
    val got = spark.sql(
      """SELECT round(cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)), 6) AS c,
        |       topk_ids(id, s, 1) AS t
        |FROM VALUES (1L, 0.9D), (2L, 0.1D) AS v(id, s)
        |GROUP BY 1""".stripMargin)
      .as[(Double, Seq[Long])].head
    assert(got === ((1.0, Seq(1L))))
  }
}
