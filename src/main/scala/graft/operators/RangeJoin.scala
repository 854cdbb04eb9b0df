package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval join — pairs (l, r) with the same keys and
  * `r.time ∈ [l.time + lower, l.time + upper]`. The windowed-correlation
  * primitive (events within N minutes of each other, sensor readings around
  * a fault, click-after-error attribution windows).
  *
  * Catalyst plans a raw `r.ts BETWEEN l.ts + a AND l.ts + b` predicate as a
  * broadcast-nested-loop join — O(|L|·|R|) comparisons and a full-side
  * broadcast, which does not survive scale-up. This operator turns the band
  * into an EQUI-join key: bucket time by the band width, replicate each left
  * row to the buckets its window can overlap (a constant ≤ 2 + ceil((upper−
  * lower)/width) copies), hash-join on (keys, bucket), then apply the exact
  * band predicate. Shuffle volume is linear in the inputs × a small
  * replication constant; AQE handles per-bucket skew like any equi-join.
  *
  * All time arithmetic is in epoch MICROseconds (`unix_micros`) — exact for
  * sub-second timestamps and reproducible externally (`epoch_us` in DuckDB).
  */
object RangeJoin {

  /** @param lowerSec,upperSec band in seconds relative to the left row's
    *                          time (e.g. (0, 600) = right within 10 min
    *                          AFTER left)
    * @param leftPrefix,rightPrefix output column prefixes */
  def banded(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, lowerSec: Long, upperSec: Long,
      leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    require(upperSec >= lowerSec, s"empty band [$lowerSec, $upperSec]")
    val lo = lowerSec * 1000000L
    val hi = upperSec * 1000000L
    val width = math.max(hi - lo, 1L)
    // left row covers right-times in [t+lo, t+hi] → every bucket between
    // the window endpoints (inclusive); ≤ 2 + ceil(span/width) copies, a
    // plan-time-bounded replication factor
    val lBuck = left
      .withColumn("__b", explode(sequence(
        floor((unix_micros(col(timeCol)) + lo) / width),
        floor((unix_micros(col(timeCol)) + hi) / width))))
    val rBuck = right
      .withColumn("__b", floor(unix_micros(col(timeCol)) / width))
    val lRenamed = left.columns.foldLeft(lBuck) { (df, c) =>
      df.withColumnRenamed(c, leftPrefix + c)
    }
    val rRenamed = right.columns.foldLeft(rBuck) { (df, c) =>
      df.withColumnRenamed(c, rightPrefix + c)
    }
    val lT = unix_micros(col(leftPrefix + timeCol))
    val rT = unix_micros(col(rightPrefix + timeCol))
    lRenamed.join(rRenamed,
        keys.map(k => col(leftPrefix + k) === col(rightPrefix + k))
          .reduce(_ && _) && lRenamed("__b") === rRenamed("__b"))
      .filter(rT >= lT + lo && rT <= lT + hi)
      .drop("__b")
  }
}
