package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-column locality lever
  * behind data-skipping at scale (the public technique in Delta Lake's
  * `OPTIMIZE ZORDER BY`, Hudi's space-filling-curve clustering): a linear
  * sort clusters ONE column, so min/max file statistics prune scans on
  * that column only; interleaving the bit representations of several
  * columns produces a single sort key whose contiguous ranges are
  * hyper-rectangles in ALL of them, so every z-ordered file covers a
  * narrow slice of every clustered column and filter pushdown skips
  * files on any of them.
  *
  * Spark shape: one aggregation computes per-column min/max (broadcast
  * back as a 1-row cross join), bucketing and bit interleaving are pure
  * map-side codegen arithmetic, and the layout lands via
  * `repartitionByRange(z) + sortWithinPartitions(z)` — exactly one
  * range shuffle, the same cost as any global sort, but buying pruning
  * on every clustered column instead of one.
  *
  * Determinism: buckets are exact integer arithmetic
  * (`(x − min) · 2^bits div (range + 1)` — `div` truncates toward zero
  * in both Spark and DuckDB), the interleave is shift/mask sums, so the
  * z-value column is engine-exact and the harness oracle re-derives it.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each bucket column: bit `i` of
    * column `j` lands at position `i · n + j` (n = column count). All
    * inputs must be non-negative BIGINT buckets below 2^bits. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty && bits > 0 &&
      buckets.size * bits <= 62,
      s"${buckets.size} cols x $bits bits must fit a BIGINT")
    val n = buckets.size
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** The z-value of `cols` (integral columns), each min/max-scaled to a
    * `bits`-bit bucket against the broadcast per-column stats the caller
    * attaches as `__mn_<col>` / `__mx_<col>`.
    *
    * Bucket arithmetic runs in DECIMAL(38,0): a BIGINT formulation
    * overflows once the column RANGE exceeds ~2^(63−bits) (hash-valued
    * or full-range long columns — `(x−mn)·2^bits` wraps, and even
    * `mx−mn+1` can), silently yielding negative/garbage z-values and a
    * meaningless layout. DECIMAL(38,0) holds 2^64·2^8 < 10^26 with
    * headroom; `div` truncates toward zero on decimals exactly as on
    * bigints in both Spark and DuckDB, so in-range values are
    * bit-identical to the old path (the q44 oracle pins this). */
  private def zCol(cols: Seq[String], bits: Int): Column =
    interleave(cols.map { c =>
      expr(s"((CAST(`$c` AS DECIMAL(38,0)) - `__mn_$c`) * ${1L << bits})" +
        s" div (CAST(`__mx_$c` AS DECIMAL(38,0)) - `__mn_$c` + 1)")
    }, bits)

  /** Attach the z-value column `zOut` (no re-layout — the verifiable
    * kernel; [[zOrderBy]] adds the physical clustering). */
  def zValues(df: DataFrame, cols: Seq[String], bits: Int = 8,
      zOut: String = "z"): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__mn_$c"),
      max(col(c)).cast("long").as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(stats))
      .withColumn(zOut, zCol(cols, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** Re-layout `df` along the Morton curve of `cols`: range-partition +
    * intra-partition sort on the z-value, ready for a parquet write
    * whose per-file min/max statistics are narrow in EVERY clustered
    * column. `partitions` ≤ 0 uses the session's shuffle parallelism. */
  def zOrderBy(df: DataFrame, cols: Seq[String], bits: Int = 8,
      partitions: Int = 0): DataFrame = {
    val parts =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    zValues(df, cols, bits, zOut = "__z")
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
