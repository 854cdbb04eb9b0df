package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning: filter the fact side of an equi-join
  * through a compact membership sketch of the dimension side's keys BEFORE
  * the join shuffle.
  *
  * This is the scale pattern behind Spark's own runtime row-level filtering
  * (`InjectRuntimeFilter`), made explicit and deterministic: at 100 TB the
  * fact-side shuffle is the dominant cost of a selective join, and a
  * few-MB bloom filter broadcast to every scan task drops non-matching rows
  * at the parquet scan — shuffle volume falls to (selectivity + fpp) of the
  * input. The transform is result-invariant by construction: a bloom filter
  * has no false negatives, so every true match survives the prune, and the
  * join itself discards the false positives. That invariance is exactly
  * what makes the operator oracle-checkable — the DuckDB oracle is the
  * PLAIN join, and any divergence means the prune broke semantics.
  *
  * The reference has no joins at all (SURVEY §2 Table B); this generalizes
  * its existence-check pattern (`driver/worker.ts:14-30` — "is this id
  * already present?") from a driver-side Map probe to a distributed
  * pre-shuffle membership test.
  */
object BloomPrune {

  /** Register the probe function (idempotent). Exposed so tests and ad-hoc
    * pruning can use [[mightContain]] without building a join first. */
  def registerMightContain(df: DataFrame): Unit =
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      es => BloomFilterMightContain(es(0), es(1)),
      "built-in")

  /** Build a serialized membership sketch over `xxhash64(key)` of `df`.
    * Hashing to a 64-bit value on BOTH build and probe sides makes the
    * filter type-agnostic — a raw-value build with a cast-to-long probe
    * would silently drop true matches for any non-integral key type. */
  def buildFilter(df: DataFrame, key: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(xxhash64(col(key)), expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-filtered by
    * a bloom filter of `dim`'s keys (any key type — both sides hash
    * through xxhash64). `fpp` trades sketch size against residual shuffle
    * volume (1% ≈ 9.6 bits/key: 1 M dim keys ≈ 1.2 MB). `expectedItems`
    * sizes the sketch; when absent it comes from a count of the dim side —
    * the dim plan is cached across the count + sketch jobs (the final
    * join's re-scan at execution time is the one recompute we can't avoid
    * without leaking a persisted plan to the caller). */
  def prunedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    registerMightContain(fact)
    val cached = dim.persist()
    val bytesOpt =
      try {
        // the dim count runs regardless of expectedItems: Spark's
        // bloom_filter_agg yields NULL over zero rows (stat.bloomFilter
        // NPEs), and an empty dim makes pruning pointless anyway
        val actual = cached.count()
        if (actual == 0) None
        else {
          val n = if (expectedItems > 0) expectedItems else actual
          Some(buildFilter(cached, dimKey, n, fpp))
        }
      } finally { cached.unpersist(); () }
    val pruned = bytesOpt match {
      case Some(bytes) => fact.filter(mightContain(bytes, col(factKey)))
      case None => fact
    }
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Membership-test column against a serialized sketch built by
    * [[buildFilter]] (probe hashes with the same xxhash64 as the build). */
  def mightContain(serialized: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(serialized), xxhash64(key))
}
