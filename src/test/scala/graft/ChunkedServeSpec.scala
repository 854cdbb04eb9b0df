package graft

import org.apache.spark.sql.functions._
import graft.operators.{ChunkedServe, IndexParams, KnnSearch}
import graft.queries.VectorQueries

/** Chunked batch serving ([[operators.ChunkedServe]]): the chunk-size
  * arithmetic encoding the SCALING.md query-batch walls, the sequential
  * serve loop's equality contract (chunked ≡ unchunked row-for-row),
  * and the facade wiring (`VectorStore.searchPqBatched`). */
class ChunkedServeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)
  private lazy val queriesDf = VectorQueries.querySet(emb)

  test("chunk-size arithmetic: the binding wall picks the chunk") {
    // LUT wall binding: nProbe 32 × m 48 × ksub 256 × 8 B = 3 MiB/query;
    // 2 GiB budget ⇒ 682 queries/chunk — the measured ~"chunk to ~2 k at
    // 384" guidance comes out of this arithmetic with the flagship knobs
    val lutBound = ChunkedServe.pqChunkRows(
      nProbe = 32, m = 48, ksub = 256, shortlist = 500, dim = 384)
    assert(lutBound === (2L << 30) / (32L * 48 * 256 * 8))
    // rerank wall binding when the shortlist is deep and the LUT small
    val rerankBound = ChunkedServe.pqChunkRows(
      nProbe = 1, m = 8, ksub = 16, shortlist = 100000, dim = 384)
    assert(rerankBound === (2L << 30) / (100000L * 384 * 4))
    assert(rerankBound ===
      ChunkedServe.rerankChunkRows(100000, 384))
    // never zero, even past any budget
    assert(ChunkedServe.pqChunkRows(1 << 20, 1 << 10, 1 << 10, 1 << 20,
      1 << 20, lutBudgetBytes = 1L, rerankBudgetBytes = 1L) === 1L)
    assert(ChunkedServe.chunkCount(0L, 10L) === 1)
    assert(ChunkedServe.chunkCount(10L, 10L) === 1)
    assert(ChunkedServe.chunkCount(11L, 10L) === 2)
    // partitions track volume, clamped to [parallelism, 4096]
    assert(ChunkedServe.volumePartitions(1L, 8) === 8)
    assert(ChunkedServe.volumePartitions(1L << 40, 8) === 4096)
    assert(ChunkedServe.volumePartitions(640L << 20, 4) === 10)
  }

  test("serveChunked: several sequential chunks union to the exact " +
      "unchunked result; membership is a disjoint cover") {
    val direct = KnnSearch.knnExact(nodesDf, queriesDf, 5, minSim = -2.0)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    var calls = 0
    var seen = List.empty[Set[Long]]
    val q = queriesDf.count()
    val rows = math.max(1L, q / 4) // force ≥4 chunks
    val chunked = ChunkedServe.serveChunked(
      queriesDf, "query_id", rows, queryCount = q) { chunk =>
      calls += 1
      seen ::= chunk.select("query_id").as[Long].collect().toSet
      KnnSearch.knnExact(nodesDf, chunk, 5, minSim = -2.0)
    }
    val got = chunked.select("query_id", "id", "rn")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === direct)
    assert(calls === ChunkedServe.chunkCount(q, rows) && calls >= 4)
    // hash membership: chunks are pairwise disjoint and cover every query
    assert(seen.map(_.size.toLong).sum === q)
    assert(seen.flatten.toSet.size.toLong === q)
    chunked.unpersist()
  }

  test("serveChunked reliableDir: parquet-backed chunks union to the " +
      "exact unchunked result and land on disk") {
    val direct = KnnSearch.knnExact(nodesDf, queriesDf, 5, minSim = -2.0)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    val q = queriesDf.count()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-reliable-chunks").toString
    val chunked = ChunkedServe.serveChunked(
      queriesDf, "query_id", math.max(1L, q / 4), queryCount = q,
      reliableDir = Some(dir)) { chunk =>
      KnnSearch.knnExact(nodesDf, chunk, 5, minSim = -2.0)
    }
    val got = chunked.select("query_id", "id", "rn")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === direct)
    // every chunk is a re-readable parquet directory (the durability
    // contract: executor loss re-reads, never re-serves)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("chunk_"))
    assert(dirs.length >= 4)
    chunked.unpersist()
  }

  test("single chunk short-circuits: serve called once on the full set") {
    var calls = 0
    val out = ChunkedServe.serveChunked(queriesDf, "query_id",
      rowsPerChunk = Long.MaxValue) { chunk => calls += 1; chunk }
    assert(calls === 1)
    assert(out.count() === queriesDf.count())
  }

  test("withShufflePartitions applies for the body and restores after") {
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    val inside = ChunkedServe.withShufflePartitions(spark, Some(7)) {
      spark.conf.get(key)
    }
    assert(inside === "7")
    assert(spark.conf.get(key) === before)
    // and a throwing body still restores
    intercept[RuntimeException] {
      ChunkedServe.withShufflePartitions(spark, Some(9)) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) === before)
  }

  test("facade: searchPqBatched ≡ searchPq row-for-row under budgets " +
      "that force several chunks") {
    val store = VectorStore.openOrCreate(spark,
      java.nio.file.Files.createTempDirectory("graft-store-chunk").toString,
      IndexParams(dim = 8, m = 4, levelMax = 1, bucketBits = 2, nBands = 2))
    val rows = (0L until 60L).map { i =>
      (i, (0 until 8).map(j => ((i * 7 + j * 3) % 11).toFloat / 11f + 0.1f))
    }
    store.addBatch(rows.toDF("id", "vector"))
    store.buildPqIndex(cells = 4)
    val qv = rows.take(8).map { case (i, v) => (i + 0L, v) }
      .toDF("query_id", "query_vec")
    val direct = store.searchPq(qv, k = 3, strengthSetting = 0)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    // dim 8 ⇒ m = 8; with this store's ksub/nProbe the per-query LUT is
    // a few KiB, so a 16 KiB budget forces several chunks over 8 queries
    val batched = store.searchPqBatched(qv, k = 3, strengthSetting = 0,
      lutBudgetBytes = 16L << 10, rerankBudgetBytes = 16L << 10)
    val got = batched.select("query_id", "id", "rn")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === direct)
    // default budgets on a tiny batch short-circuit to one chunk and
    // still serve the same rows
    val one = store.searchPqBatched(qv, k = 3, strengthSetting = 0)
      .select("query_id", "id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(one === direct)
    store.delete()
  }
}
