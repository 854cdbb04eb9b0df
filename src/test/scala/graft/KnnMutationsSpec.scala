package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnSearch, Mutations}

class KnnMutationsSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(rows: (Long, Seq[Float], Boolean)*) =
    rows.toDF("id", "vector", "deleted")
  private def queries(rows: (Long, Seq[Float])*) =
    rows.toDF("query_id", "query_vec")

  test("threshold scaling: /100 capped at 0.95 (driver/driver.ts:296-298)") {
    assert(KnnSearch.scaleThreshold(50) === 0.5)
    assert(KnnSearch.scaleThreshold(99) === 0.95)
    assert(KnnSearch.scaleThreshold(120) === 0.95)
  }

  test("knnExact: top-k, threshold, tombstone exclusion, id tie-break") {
    val n = nodes(
      (1L, Seq(1f, 0f), false),
      (2L, Seq(0.9f, 0.1f), false),
      (3L, Seq(0f, 1f), false),      // below threshold vs query
      (4L, Seq(1f, 0f), true),       // tombstoned twin of 1
      (5L, Seq(1f, 0f), false))      // exact tie with 1 → id order
    val q = queries((100L, Seq(1f, 0f)))
    val got = KnnSearch.knnExact(n, q, k = 3, minSim = 0.5)
      .select("id", "rn").as[(Long, Int)].collect().toList
    assert(got === List((1L, 1), (5L, 2), (2L, 3)))
  }

  test("zero-norm vector (NaN score) never surfaces in results") {
    // Spark orders NaN above every double; without the explicit guard a
    // zero vector would pass the threshold and take rank 1 for all queries
    val n = nodes(
      (1L, Seq(1f, 0f), false),
      (2L, Seq(0f, 0f), false)) // zero vector → NaN cosine
    val q = queries((100L, Seq(1f, 0f)))
    val got = KnnSearch.knnExact(n, q, k = 10, minSim = -10.0)
      .select("id").as[Long].collect().toList
    assert(got === List(1L))
  }

  test("unknown metric throws (hnsw.ts:39-49)") {
    val e = intercept[IllegalArgumentException] {
      KnnSearch.knnExact(nodes(), queries(), 1, 0.5, metric = "manhattan")
    }
    assert(e.getMessage.contains("manhattan"))
  }

  test("pointLookup returns tombstoned rows (driver/driver.ts:309-312)") {
    val n = nodes((7L, Seq(1f, 0f), true))
    val got = KnnSearch.pointLookup(n, lit(7L)).collect()
    assert(got.length === 1 && got(0).getAs[Boolean]("deleted"))
  }

  test("upsert: latest wins, new ids appended (hnsw.ts:164-167, 497-517)") {
    val cur = nodes((1L, Seq(1f, 0f), false), (2L, Seq(0f, 1f), false))
    val delta = nodes((2L, Seq(0.5f, 0.5f), false), (3L, Seq(1f, 1f), false))
    val out = Mutations.upsert(cur, delta).orderBy("id")
      .as[(Long, Seq[Float], Boolean)].collect().toList
    assert(out === List(
      (1L, Seq(1f, 0f), false),
      (2L, Seq(0.5f, 0.5f), false),
      (3L, Seq(1f, 1f), false)))
  }

  test("upsert within-batch order: higher batch_seq wins (FIFO queue)") {
    val cur = nodes((1L, Seq(1f, 0f), false))
    val delta = Seq(
      (1L, Seq(2f, 0f), false, 1L),
      (1L, Seq(3f, 0f), false, 2L)).toDF("id", "vector", "deleted", "batch_seq")
    val out = Mutations.upsert(cur, delta).as[(Long, Seq[Float], Boolean)]
      .collect().toList
    assert(out === List((1L, Seq(3f, 0f), false)))
  }

  test("tombstone marks rows deleted but keeps them (hnsw.ts:212-226)") {
    val cur = nodes((1L, Seq(1f, 0f), false), (2L, Seq(0f, 1f), false))
    val out = Mutations.tombstone(cur, Seq(Tuple1(2L)).toDF("id"))
      .orderBy("id").as[(Long, Seq[Float], Boolean)].collect().toList
    assert(out.map(r => (r._1, r._3)) === List((1L, false), (2L, true)))
  }

  test("syncDiff keeps only new or changed, drops empty vectors (worker.ts:3-44)") {
    val cur = nodes((1L, Seq(1f, 0f), false), (2L, Seq(0f, 1f), false))
    val incoming = nodes(
      (1L, Seq(1f, 0f), false),   // unchanged → skip
      (2L, Seq(0f, 2f), false),   // changed → keep
      (3L, Seq(1f, 1f), false),   // new → keep
      (4L, Seq.empty[Float], false)) // empty → skip
    val got = Mutations.syncDiff(cur, incoming)
      .select("id").as[Long].collect().sorted.toList
    assert(got === List(2L, 3L))
  }

  test("compact drops tombstones physically (astrovault.ts:87-132)") {
    val cur = nodes((1L, Seq(1f, 0f), false), (2L, Seq(0f, 1f), true))
    assert(Mutations.compact(cur).select("id").as[Long].collect().toList
      === List(1L))
  }
}
