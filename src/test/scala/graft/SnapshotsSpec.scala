package graft

import org.apache.spark.sql.functions._
import graft.util.{Fs, Snapshots}

/** Crash-recovery contracts of the versioned snapshot + delta chains —
  * the claims the scaladoc makes, exercised: an orphan delta directory
  * (crash between the delta write and the pointer flip) is invisible to
  * readers and silently overwritten by the next append; a written-but-
  * unflipped base generation leaves the previous one served; prune
  * removes exactly the superseded directories. */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-snap").toString

  test("persist/load round-trip; appendDelta advances the pointer " +
      "atomically; prune removes version + deltas") {
    val base = tmp()
    val v0 = Snapshots.persist(spark, base, "t", "PTR",
      Seq((1L, "a")).toDF("id", "x"))
    assert(v0 === 0L)
    assert(Snapshots.currentWithDeltas(spark, base, "PTR")
      .contains((0L, 0L)))
    assert(Snapshots.load(spark, base, "t", "PTR", "t")
      .as[(Long, String)].collect().toSet === Set((1L, "a")))
    val (v, k) = Snapshots.appendDelta(spark, base, "t", "PTR",
      Seq((2L, "b")).toDF("id", "x"))
    assert((v, k) === (0L, 1L))
    assert(Snapshots.currentWithDeltas(spark, base, "PTR")
      .contains((0L, 1L)))
    // load serves the BASE (overlay semantics belong to the caller)
    assert(Snapshots.load(spark, base, "t", "PTR", "t").count() === 1L)
    // a new full persist resets the delta count (single-token pointer)
    val v1 = Snapshots.persist(spark, base, "t", "PTR",
      Seq((9L, "z")).toDF("id", "x"))
    assert(v1 === 1L)
    assert(Snapshots.currentWithDeltas(spark, base, "PTR")
      .contains((1L, 0L)))
    Snapshots.prune(spark, base, "t", 0L, 1L)
    assert(!Fs.exists(spark, Snapshots.versionPath(base, "t", 0L)))
    assert(!Fs.exists(spark, Snapshots.deltaPath(base, "t", 0L, 1L)))
    assert(Fs.exists(spark, Snapshots.versionPath(base, "t", 1L)))
  }

  test("orphan delta dir (crash before the pointer flip) is invisible " +
      "and overwritten by the next append") {
    val base = tmp()
    Snapshots.persist(spark, base, "t", "PTR",
      Seq((1L, "a")).toDF("id", "x"))
    // simulate the crash: delta 1's directory exists, pointer still "0"
    Seq((666L, "ghost")).toDF("id", "x")
      .write.parquet(Snapshots.deltaPath(base, "t", 0L, 1L))
    assert(Snapshots.currentWithDeltas(spark, base, "PTR")
      .contains((0L, 0L))) // reader sees zero deltas
    // the next append lands as delta 1 again, replacing the orphan
    Snapshots.appendDelta(spark, base, "t", "PTR",
      Seq((2L, "real")).toDF("id", "x"))
    assert(Snapshots.currentWithDeltas(spark, base, "PTR")
      .contains((0L, 1L)))
    val served = spark.read
      .parquet(Snapshots.deltaPath(base, "t", 0L, 1L))
      .as[(Long, String)].collect().toSet
    assert(served === Set((2L, "real")), s"ghost row survived: $served")
  }

  test("written-but-unflipped base generation: the previous one stays " +
      "served (the compressed-index flip contract)") {
    val base = tmp()
    Snapshots.persist(spark, base, "t", "PTR",
      Seq((1L, "old")).toDF("id", "x"))
    // a crashed rebuild wrote v1's data but never flipped the pointer
    Seq((2L, "new")).toDF("id", "x")
      .write.parquet(Snapshots.versionPath(base, "t", 1L))
    assert(Snapshots.load(spark, base, "t", "PTR", "t")
      .as[(Long, String)].collect().toSet === Set((1L, "old")))
    // retrying the rebuild through persist() supersedes the orphan:
    // the next version number is pointer-derived (0 → 1), so the retry
    // OVERWRITES the orphan directory and then flips — never serving
    // the crashed write's content alongside the new one
    Snapshots.persist(spark, base, "t", "PTR",
      Seq((3L, "retry")).toDF("id", "x"))
    assert(Snapshots.load(spark, base, "t", "PTR", "t")
      .as[(Long, String)].collect().toSet === Set((3L, "retry")))
  }

  test("VectorStore PQ chain survives an orphan delta: append after a " +
      "simulated crash serves only the real rows") {
    val store = VectorStore.openOrCreate(spark,
      java.nio.file.Files.createTempDirectory("graft-snap-pq").toString,
      graft.operators.IndexParams(dim = 8, m = 4, levelMax = 1,
        bucketBits = 2, nBands = 2))
    def vec(i: Long): Seq[Float] =
      (0 until 8).map(j => ((i * 7 + j * 3) % 257).toFloat / 257f + 0.1f)
    store.addBatch((0L until 30L).map(i => (i, vec(i))).toDF("id", "vector"))
    store.buildPqIndex(cells = 4)
    // crash artifact: a pq delta dir with garbage codes, pointer unflipped
    Seq((999L, -1, -1, -1)).toDF("id", "cell", "sub", "code")
      .write.parquet(graft.util.Snapshots.deltaPath(store.path, "pq", 0L, 1L))
    assert(store.loadPqIndex().codes.filter(col("id") === 999L).count() === 0)
    store.appendPqIndex(Seq((100L, vec(100L))).toDF("id", "vector"))
    val codes = store.loadPqIndex().codes
    assert(codes.filter(col("id") === 999L).count() === 0,
      "orphan-delta ghost row served after append")
    assert(codes.filter(col("id") === 100L).count() === 8L)
    store.delete()
  }

  test("readChain: ONE multi-path scan for the whole chain — delta " +
      "index parses from the file path, plan holds a single file scan " +
      "regardless of chain length, mixed schemas null-fill") {
    val base = tmp()
    Snapshots.persist(spark, base, "t", "PTR",
      Seq((0L, "base")).toDF("id", "x"))
    Snapshots.appendDelta(spark, base, "t", "PTR",
      Seq((1L, "a")).toDF("id", "x"))
    Snapshots.appendDelta(spark, base, "t", "PTR",
      Seq((2L, "b")).toDF("id", "x"))
    // third delta written across a schema upgrade: an extra column the
    // earlier files lack (mergeSchema must surface it, null-filled)
    Snapshots.appendDelta(spark, base, "t", "PTR",
      Seq((3L, "c", true)).toDF("id", "x", "extra"))
    val df = Snapshots.readChain(spark,
      (1L to 3L).map(i => Snapshots.deltaPath(base, "t", 0L, i)),
      ".*_delta_(\\d+)/")
    assert(df.select(col("id"), col("__ds")).as[(Long, Long)]
      .collect().toSet === Set((1L, 1L), (2L, 2L), (3L, 3L)))
    assert(df.filter(col("id") === 1L).select("extra")
      .collect().head.isNullAt(0))
    assert(df.filter(col("id") === 3L).select("extra")
      .as[Boolean].head())
    // plan shape: the chain is ONE scan, not one branch per delta — the
    // flat-overlay property ChainServeProbe measures
    val scans = "Scan parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans === 1, s"expected 1 chain scan, plan had $scans")
  }
}
