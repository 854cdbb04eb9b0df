package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{IvfIndex, PqIndex}
import graft.queries.VectorQueries

/** [[graft.functions.NearestCodeExpr]] — the map-side quantizer-assignment
  * kernel — must reproduce the join-then-`max_by` formulation it replaced
  * BIT FOR BIT (the a04/a05/a10–a17 oracle rows hash-pin assignments and
  * codes): same winner on clear margins, lowest-id winner on exact-score
  * ties, NaN-greatest on degenerate (zero-vector) inputs. The old
  * formulation is re-derived inline here as the reference. */
class NearestCodeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)

  /** The replaced formulation, verbatim: broadcast join + max_by over
    * (sim, −cell). */
  private def assignMaxBy(nodes: DataFrame, centroids: DataFrame)
      : DataFrame = {
    val payload = nodes.columns.filterNot(_ == "id")
    nodes.join(broadcast(centroids))
      .withColumn("__key", struct(
        VectorFunctions.cosineSim(col("vector"), col("centroid")).as("sim"),
        (lit(0) - col("cell")).as("negcell")))
      .groupBy(col("id"))
      .agg(expr("max_by(cell, __key)").as("cell"),
        payload.map(c => first(col(c)).as(c)).toIndexedSeq: _*)
      .select((Seq("id") ++ payload ++ Seq("cell")).map(col).toIndexedSeq: _*)
  }

  private def encodeMaxBy(nodes: DataFrame, codebooks: DataFrame,
      m: Int, subLen: Int): DataFrame =
    PqIndex.subSlices(nodes, m, subLen)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("__key", struct(
        (lit(0.0) - VectorFunctions.euclideanDist(col("subvec"),
          col("centroid"))).as("negd"),
        (lit(0) - col("code")).as("negcode")))
      .groupBy(col("id"), col("sub"))
      .agg(expr("max_by(code, __key)").as("code"))

  test("assign kernel ≡ join+max_by on the embeddings fixture") {
    val cents = IvfIndex.train(nodesDf, 8, iters = 2)
    val got = IvfIndex.assign(nodesDf, cents)
      .select("id", "cell").as[(Long, Int)].collect().toSet
    val want = assignMaxBy(nodesDf, cents)
      .select("id", "cell").as[(Long, Int)].collect().toSet
    assert(got === want)
  }

  test("assign kernel: exact-score ties keep the LOWEST cell (duplicate centroids)") {
    val nodes = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.6f, 0.8f)))
      .toDF("id", "vector")
    // cells 1 and 3 are identical — max_by's −cell tiebreak must pick 1
    val cents = Seq((0, Seq(0f, 1f)), (1, Seq(1f, 0f)),
      (3, Seq(1f, 0f)), (2, Seq(0.6f, 0.8f)))
      .toDF("cell", "centroid")
    val got = IvfIndex.assign(nodes, cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    val want = assignMaxBy(nodes, cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(got === want)
    assert(got(1L) === 1) // not 3
  }

  test("assign kernel: NaN sims rank greatest (zero vector → lowest cell), like max_by") {
    val nodes = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)))
      .toDF("id", "vector")
    val cents = Seq((0, Seq(0f, 1f)), (1, Seq(1f, 0f)))
      .toDF("cell", "centroid")
    val got = IvfIndex.assign(nodes, cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    val want = assignMaxBy(nodes, cents)
      .select("id", "cell").as[(Long, Int)].collect().toMap
    assert(got === want)
    assert(got(1L) === 0) // every sim NaN → all keys tie → lowest cell
  }

  test("encode kernel ≡ join+max_by, including an exact-tie codebook") {
    val m = 8; val subLen = 8
    val cb = PqIndex.trainCodebooks(nodesDf, m, subLen, ksub = 16,
      iters = 1)
    val got = PqIndex.encode(nodesDf, cb, m, subLen)
      .as[(Long, Int, Int)].collect().toSet
    val want = encodeMaxBy(nodesDf, cb, m, subLen)
      .as[(Long, Int, Int)].collect().toSet
    assert(got === want)

    // duplicate sub-centroids: codes 2 and 5 identical in every sub —
    // the tie must resolve to 2 on both formulations
    val dup = cb.withColumn("centroid",
      when(col("code") === 5,
        expr("transform(centroid, x -> float(0.25))"))
      .otherwise(col("centroid")))
      .withColumn("centroid",
        when(col("code") === 2,
          expr("transform(centroid, x -> float(0.25))"))
        .otherwise(col("centroid")))
    val gotD = PqIndex.encode(nodesDf, dup, m, subLen)
      .as[(Long, Int, Int)].collect().toSet
    val wantD = encodeMaxBy(nodesDf, dup, m, subLen)
      .as[(Long, Int, Int)].collect().toSet
    assert(gotD === wantD)
    assert(!gotD.exists(_._3 == 5)) // 2 always shadows 5
  }

  test("topCells kernel ≡ join+window probe ranking (incl. ties and a zero vector)") {
    val cents = IvfIndex.train(nodesDf, 16, iters = 1)
      // duplicate centroid: cell 9 copies cell 3 — tie must keep 3 first
      .withColumn("centroid", when(col("cell") === 9,
        expr("transform(centroid, x -> float(0.5))"))
        .otherwise(col("centroid")))
      .withColumn("centroid", when(col("cell") === 3,
        expr("transform(centroid, x -> float(0.5))"))
        .otherwise(col("centroid")))
    val qs = nodesDf.limit(30)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      // one degenerate query: all-zero vector → every sim NaN
      .union(spark.sql("SELECT -1L AS query_id, " +
        "transform(sequence(1, 8), x -> float(0)) AS query_vec"))
    val collected = cents.select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val got = qs.select(col("query_id"),
        explode(graft.functions.VectorFunctions.topCells(col("query_vec"),
          collected.map(_._2.toSeq).toSeq, collected.map(_._1).toSeq, 4))
          .as("cell"))
      .select("query_id", "cell").as[(Long, Int)].collect().toSet
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cell").asc)
    val want = qs.join(broadcast(cents))
      .withColumn("__csim",
        VectorFunctions.cosineSim(col("query_vec"), col("centroid")))
      .withColumn("__crn", row_number().over(cw))
      .filter(col("__crn") <= 4)
      .select("query_id", "cell").as[(Long, Int)].collect().toSet
    assert(got === want)
    // the tie pair: whenever 9 is probed, 3 must be probed too (3 ranks first)
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, cells) =>
      if (cells.exists(_._2 == 9)) assert(cells.exists(_._2 == 3), s"query $q")
    }
  }

  test("assignHierarchical kernel path ≡ flat assign at superK = k (degenerate pin)") {
    val cents = IvfIndex.train(nodesDf, 12, iters = 1)
    val flat = IvfIndex.assign(nodesDf, cents)
      .select("id", "cell").as[(Long, Int)].collect().toSet
    val two = IvfIndex.assignHierarchical(nodesDf, cents, superK = 12)
      .select("id", "cell").as[(Long, Int)].collect().toSet
    assert(two === flat)
  }
}
