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

  /** Per-group KMV distinct-count estimate of `valueCol`.
    * Output: groupCols + (est_distinct double, n_kept int). Groups with
    * fewer than k distinct values report their exact count (est = n). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
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
      .agg(count(lit(1)).cast("int").as("n_kept"),
        max(col("__f")).as("__kth"))
      .select(gs ++ Seq(
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(k - 1).cast("double") / col("__kth")), 3)
          .as("est_distinct"),
        col("n_kept")): _*)
  }
}
