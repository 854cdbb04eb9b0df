package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnnSearch, IndexBuild, IndexParams, KnnSearch}
import graft.queries.VectorQueries

/** Incremental merge ([[IndexBuild.merge]]): structural invariants match the
  * full build's, merged-index search quality tracks a from-scratch rebuild,
  * and update/tombstone deltas rewire (not just append). */
class IndexMergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val all = VectorQueries.asVectorTable(emb)
  private lazy val queriesDf = VectorQueries.querySet(emb)
  private val params = IndexParams(m = 8, levelMax = 3, bucketBits = 4, nBands = 4)

  private def invariants(nodes: DataFrame, edges: DataFrame): Unit = {
    val maxDeg = edges.groupBy("level", "src").count()
      .agg(coalesce(max("count"), lit(0L))).head.getLong(0)
    assert(maxDeg <= params.m, s"degree $maxDeg > M=${params.m}")
    assert(edges.filter(col("src") === col("dst")).count() === 0)
    assert(edges.groupBy("level", "src", "dst").count()
      .filter(col("count") > 1).count() === 0, "duplicate edges")
    // every edge endpoint lives on that level and is not tombstoned
    val members = nodes.filter(!col("deleted"))
      .select(col("id"), col("level").as("node_level"))
    for (end <- Seq("src", "dst")) {
      val bad = edges.join(members, edges(end) === members("id"), "left_outer")
        .filter(col("node_level").isNull || col("node_level") < col("level"))
        .count()
      assert(bad === 0, s"$end endpoints outside live membership")
    }
  }

  private def graphRecall(nodes: DataFrame, edges: DataFrame): Double = {
    val exact = KnnSearch.knnExact(all, queriesDf, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val got = AnnSearch.searchGraph(nodes, edges, queriesDf,
        k = 10, minSim = -2.0, params, ef = 64, itersPerLevel = 2)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    exact.intersect(got).size.toDouble / exact.size
  }

  test("merge of a 10% delta matches rebuild on nodes and holds invariants") {
    val delta = all.filter(col("id") % 10 === 3)
    val base = all.filter(col("id") % 10 =!= 3)
    val (bn, be) = IndexBuild.build(base, params)
    val (mn, me) = IndexBuild.merge(bn, be, delta, params)
    invariants(mn, me)
    // node table identical to a full rebuild's (levels are pure in id)
    val (rn, _) = IndexBuild.build(all, params)
    val mSet = mn.select("id", "level", "deleted")
      .as[(Long, Int, Boolean)].collect().toSet
    val rSet = rn.select("id", "level", "deleted")
      .as[(Long, Int, Boolean)].collect().toSet
    assert(mSet === rSet)
    // delta nodes are wired in: every live delta id has out-edges on layer 0
    val missing = delta.select(col("id").as("src")).distinct()
      .join(me.filter(col("level") === 0).select("src").distinct(),
        Seq("src"), "left_anti").count()
    assert(missing === 0, s"$missing delta nodes left unwired")
  }

  test("merged-index graph search recall tracks the full rebuild's") {
    val delta = all.filter(col("id") % 10 === 3)
    val base = all.filter(col("id") % 10 =!= 3)
    val (bn, be) = IndexBuild.build(base, params)
    val (mn, me) = IndexBuild.merge(bn, be, delta, params)
    val (rn, re) = IndexBuild.build(all, params)
    val merged = graphRecall(mn, me)
    val rebuilt = graphRecall(rn, re)
    assert(merged >= rebuilt - 0.1,
      s"merged recall $merged vs rebuild $rebuilt")
  }

  test("vector update rewires: stale edges dropped, new neighborhood found") {
    val (bn, be) = IndexBuild.build(all, params)
    // move node 7 to the exact position of node 400 — its new neighborhood
    // must become 400's, not its old one
    val newVec = all.filter(col("id") === 400L)
      .select(col("vector")).as[Array[Float]].head()
    val delta = Seq((7L, newVec, false)).toDF("id", "vector", "deleted")
    val (mn, me) = IndexBuild.merge(bn, be, delta, params)
    invariants(mn, me)
    // 7's layer-0 out-edges now include 400 (identical vector, sim = 1)
    val hit = me.filter(col("level") === 0 && col("src") === 7L &&
      col("dst") === 400L).count()
    assert(hit === 1L, "moved node not linked to its new twin")
  }

  test("anchored merge: run-to-run deterministic, invariants hold, stale edges rewired") {
    // the oracle-checkable merge path (a13): anchored keys + plain-id cap
    // order. The DuckDB gate hash-checks every row at sf0.01; here we pin
    // determinism across runs and the merge semantics the gate relies on.
    val anchors = graft.queries.AnnQueries.anchorPlanes(emb, nBands = 4, bits = 3)
    val (bn0, be0) = IndexBuild.buildAnchored(all, params, anchors)
    val (bn, be) = (bn0.localCheckpoint(), be0.localCheckpoint())
    val delta = all.filter(col("id") % 40 === 1)
      .withColumn("vector", transform(col("vector"), x => -x))
    def run() = {
      val (mn, me) = IndexBuild.mergeAnchored(bn, be, delta, params, anchors)
      (mn, me.select("level", "src", "dst", "score")
        .as[(Int, Long, Long, Double)].collect().toSet)
    }
    val (mn, e1) = run()
    val (_, e2) = run()
    assert(e1 === e2, "anchored merge must be bit-deterministic")
    invariants(mn, IndexBuild.mergeAnchored(bn, be, delta, params, anchors)._2)
    // every delta id got rewired out-edges on layer 0 (negated vectors moved)
    val deltaIds = delta.select("id").as[Long].collect().toSet
    val srcs = e1.filter(_._1 == 0).map(_._2)
    assert(deltaIds.subsetOf(srcs), "delta nodes must be wired in at layer 0")
  }

  test("tombstone delta removes the node from the graph but keeps the row") {
    val (bn, be) = IndexBuild.build(all, params)
    val vec = all.filter(col("id") === 42L)
      .select(col("vector")).as[Array[Float]].head()
    val delta = Seq((42L, vec, true)).toDF("id", "vector", "deleted")
    val (mn, me) = IndexBuild.merge(bn, be, delta, params)
    invariants(mn, me)
    assert(me.filter(col("src") === 42L || col("dst") === 42L).count() === 0)
    val row = mn.filter(col("id") === 42L).select("deleted").as[Boolean].head()
    assert(row, "tombstoned row must stay in the node table")
  }
}
