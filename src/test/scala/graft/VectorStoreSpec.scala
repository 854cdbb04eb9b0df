package graft

import org.apache.spark.sql.functions._
import graft.operators.IndexParams

/** Full lifecycle through the user-facing facade — the flows a reference
  * user runs today (README.md:28-66): create, add, search, update, delete,
  * sync, compact+rebuild, ANN search, drop. */
class VectorStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = VectorStore.openOrCreate(spark,
    java.nio.file.Files.createTempDirectory("graft-store").toString,
    IndexParams(dim = 2, m = 4, levelMax = 1, bucketBits = 2, nBands = 2))

  test("lifecycle: add → search → update → remove → sync → compact → ann") {
    val store = freshStore()
    assert(store.count() === 0)

    store.add(1L, Seq(1f, 0f))
    store.addBatch(Seq((2L, Seq(0f, 1f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("id", "vector"))
    assert(store.count() === 3)

    // threshold-scaled search: setting 50 → 0.5 floor
    val hits = store.search(Seq(1f, 0f), k = 2, strengthSetting = 50)
      .as[(Long, Double)].collect().toList
    assert(hits.map(_._1) === List(1L, 3L))

    store.updateVector(3L, Seq(0f, 1f)) // moves 3 away from the query
    assert(store.search(Seq(1f, 0f), 2, 50).as[(Long, Double)]
      .collect().map(_._1).toList === List(1L))

    store.remove(1L)
    assert(store.getNode(1L).exists(_._3 === true)) // tombstoned, still readable
    assert(store.search(Seq(1f, 0f), 2, 50).count() === 0) // hidden from search

    // sync: unchanged row skipped, changed + new applied
    val applied = store.sync(Seq(
      (2L, Seq(0f, 1f), false),      // unchanged
      (2L, Seq(0.5f, 0.5f), false),  // changed (same id later in batch)
      (9L, Seq(1f, 1f), false)).toDF("id", "vector", "deleted"))
    assert(applied === 2L)

    store.rebuild() // compaction drops the tombstone physically
    assert(store.nodes.filter(col("id") === 1L).count() === 0)

    // both 2:(0.5,0.5) and 9:(1,1) are parallel to the query (cos = 1.0) —
    // the tie breaks on id, same as the exact path
    val ann = store.searchAnn(
      Seq((100L, Seq(1f, 1f))).toDF("query_id", "query_vec"), k = 2,
      strengthSetting = 50)
    assert(ann.select("id").as[Long].collect().toList === List(2L, 9L))

    val path = store.path
    store.delete()
    assert(!new java.io.File(path).exists())
  }

  test("validation: null id and wrong dimension are rejected (hnsw.ts:155-160)") {
    val store = freshStore()
    intercept[IllegalArgumentException] {
      store.add(5L, Seq(1f, 2f, 3f)) // dim 3 into a dim-2 store
    }
    intercept[IllegalArgumentException] {
      store.addBatch(Seq((Option.empty[Long], Seq(1f, 0f)))
        .toDF("id", "vector"))
    }
    store.delete()
  }

  test("mergeIndex folds a delta into the saved index without rebuild") {
    val store = freshStore()
    store.addBatch(Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(0.9f, 0.1f))).toDF("id", "vector"))
    store.rebuild()
    // new vector near (1,0) arrives; merge, don't rebuild
    store.mergeIndex(Seq((9L, Seq(0.95f, 0.05f))).toDF("id", "vector"))
    val hits = store.searchAnn(
        Seq((0L, Seq(1f, 0f))).toDF("query_id", "query_vec"),
        k = 3, strengthSetting = 50)
      .select("id").as[Long].collect().toSet
    assert(hits.contains(9L), s"merged vector not searchable: $hits")
    // tombstone through the same path: 1 disappears from ANN results
    store.mergeIndex(Seq((1L, Seq(1f, 0f), true))
      .toDF("id", "vector", "deleted"))
    val after = store.searchAnn(
        Seq((0L, Seq(1f, 0f))).toDF("query_id", "query_vec"),
        k = 3, strengthSetting = 50)
      .select("id").as[Long].collect().toSet
    assert(!after.contains(1L), s"tombstoned id still served: $after")
    assert(after.contains(9L))
    store.delete()
  }

  test("reopen sees persisted state (createAstroDB load path)") {
    val store = freshStore()
    store.add(7L, Seq(0.5f, 0.5f))
    val reopened = VectorStore.openOrCreate(spark, store.path,
      store.params)
    assert(reopened.getNode(7L).exists(_._2 === Seq(0.5f, 0.5f)))
    store.delete()
  }
}
