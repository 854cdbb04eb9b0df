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

  /** Spark's sketch `putLong`/`mightContainLong` pair hashes the raw long,
    * so build (`stat.bloomFilter`) and probe (`BloomFilterMightContain`)
    * agree as long as the probe key is LongType. */
  private def registerMightContain(df: DataFrame): Unit =
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      es => BloomFilterMightContain(es(0), es(1)),
      "built-in")

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-filtered by
    * a bloom filter of `dim`'s keys. `fpp` trades sketch size against
    * residual shuffle volume (1% ≈ 9.6 bits/key: 1 M dim keys ≈ 1.2 MB).
    * `expectedItems` sizes the sketch; defaults to a count of the (already
    * filtered, typically small) dim side — one cheap job that would be a
    * cached statistic in a warehouse deployment. */
  def prunedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    registerMightContain(fact)
    val n = if (expectedItems > 0) expectedItems
            else math.max(dim.count(), 1L)
    val bf = dim.stat.bloomFilter(dimKey, n, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val pruned = fact.filter(mightContain(bytes, col(factKey)))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Membership-test column against a serialized sketch (exposed for plan
    * tests and ad-hoc pruning of other operators' inputs). */
  def mightContain(serialized: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain", lit(serialized), key.cast("long"))
}
