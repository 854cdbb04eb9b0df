package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching. `approx_count_distinct` (HLL++) is
  * the built-in, but its register layout is engine-internal — useless when
  * an external system must verify (or merge) the sketch. KMV (K-Minimum
  * Values) keeps the k smallest normalized hashes of the distinct values:
  *  - estimate = (k−1) / kth_min_fraction (the classic bottom-k estimator)
  *  - MERGEABLE: union two sketches' value sets, re-take the k minima —
  *    associative + commutative, so map-side partial sketches combine like
  *    any semigroup aggregate
  *  - REPRODUCIBLE: md5-derived fractions, bit-identical in any engine —
  *    the DuckDB oracle re-computes the whole sketch from the raw table.
  *
  * Hash: first 15 hex chars of md5(value-as-string) → integer < 2^60,
  * divided by 2^60 — exact in double, no float accumulation anywhere.
  */
object Sketches {

  /** The raw sketch: per group, the (sorted) k smallest hash fractions of
    * the distinct values — the mergeable state. Output: groupCols +
    * `kmv: array<double>`. */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    val gs = groupCols.map(col)
    val frac = conv(substring(md5(col(valueCol).cast("string")), 1, 15),
      16, 10).cast("long").cast("double") / math.pow(2, 60)
    val w = Window.partitionBy(gs: _*).orderBy(col("__f").asc)
    // countDistinct semantics: NULL is not a value — and unfiltered it
    // would hash to a NULL fraction that sorts FIRST (Spark nulls-first),
    // stealing a sketch slot
    df.filter(col(valueCol).isNotNull)
      .select(gs :+ col(valueCol): _*).distinct()
      .withColumn("__f", frac)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(gs: _*)
      .agg(array_sort(collect_list(col("__f"))).as("kmv"))
  }

  /** Merge sketches of the same group (e.g. from different data slices):
    * union the value sets, re-take the k minima — associative and
    * commutative, so partial sketches combine like any semigroup. */
  def kmvMerge(sketches: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val gs = groupCols.map(col)
    sketches.groupBy(gs: _*)
      .agg(slice(array_sort(array_distinct(flatten(
        collect_list(col("kmv"))))), 1, k).as("kmv"))
  }

  /** Estimate from a sketch: (k−1)/kth_min, or the exact kept count for
    * below-k groups. Output: groupCols + (est_distinct, n_kept). */
  def kmvEstimate(sketches: DataFrame, k: Int): DataFrame =
    sketches
      .withColumn("n_kept", size(col("kmv")))
      .select(sketches.columns.filter(_ != "kmv").map(col).toIndexedSeq ++ Seq(
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1).cast("double") /
            element_at(col("kmv"), k)), 3).as("est_distinct"),
        col("n_kept").cast("int").as("n_kept")): _*)

  /** Per-group KMV distinct-count estimate of `valueCol`.
    * Output: groupCols + (est_distinct double, n_kept int). Groups with
    * fewer than k distinct values report their exact count (est = n). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame =
    kmvEstimate(kmvSketch(df, groupCols, valueCol, k), k)

  /** EXACT heavy hitters over unbounded key cardinality — the two-pass
    * Misra–Gries scheme (the classic frequency-sketch answer at scale;
    * MG is the deterministic summary behind "find every token above
    * 0.x% of a 100 TB corpus" without shuffling the full vocabulary):
    *
    *  1. each partition runs MG with k = ⌈1e6/shareMicro⌉ counters and
    *     emits only its ≤ k candidate KEYS — O(k) state and O(k) output
    *     per partition, no shuffle of the key universe. MG's undercount
    *     bound (≤ nᵢ/(k+1) per partition) makes the union a guaranteed
    *     SUPERSET of every key with global share ≥ shareMicro/1e6.
    *  2. the corpus recounts ONLY candidate rows (broadcast semi-join,
    *     bounded by partitions × k keys) and filters on the exact
    *     integer threshold — so the OUTPUT is exact and deterministic
    *     (the sketch's order-dependence dies in pass 2; only candidate
    *     membership, a superset either way, ever depended on order).
    *
    * The threshold is integer-exact: minCount =
    * ⌈n · shareMicro / 1e6⌉ in BIGINT arithmetic — no float share
    * boundary for an oracle to disagree on. NULL keys are not values
    * (the [[kmvSketch]] rule). Output: (keyCol, cnt). */
  def heavyHitters(df: DataFrame, keyCol: String,
      shareMicro: Long): DataFrame = {
    require(shareMicro > 0 && shareMicro <= 1000000L,
      s"shareMicro $shareMicro must be in (0, 1e6]")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .filter(col("k").isNotNull)
    val n = keys.count()
    val k = math.max(1L, (1000000L + shareMicro - 1) / shareMicro).toInt
    val candidates = keys.as[String].mapPartitions { rows =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { v =>
        counters.get(v) match {
          case Some(c) => counters(v) = c + 1
          case None if counters.size < k => counters(v) = 1L
          case None => // decrement-all; evict zeros
            counters.keys.toArray.foreach { key =>
              val c = counters(key) - 1
              if (c == 0L) counters.remove(key) else counters(key) = c
            }
        }
      }
      counters.keysIterator
    }.toDF("k").distinct()
    // BigInt: n * shareMicro wraps Long past ~9.2e18 (a 100 TB corpus
    // at high shareMicro), which would turn the threshold negative and
    // pass every candidate
    val minCount =
      ((BigInt(n) * shareMicro + 999999L) / 1000000L).toLong
    keys.join(broadcast(candidates), Seq("k"), "left_semi")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("k").as(keyCol), col("cnt"))
  }
}
