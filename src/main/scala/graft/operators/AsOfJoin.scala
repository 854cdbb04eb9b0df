package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single latest right row with
  * `right.time <= left.time` in the same key group ("latest observation
  * carried forward"). The temporal-attribution primitive a training-data
  * pipeline needs (attach the most recent context/state row to every event)
  * that Spark has no native operator for.
  *
  * NOT implemented as an inequality join: Catalyst plans `l.ts >= r.ts` as a
  * broadcast-nested-loop (O(|L|·|R|) comparisons and a broadcast of a whole
  * side). Instead: union both sides, one shuffle on the keys, sort each
  * group by (time, side, tiebreak), and run `last(right_payload, ignoreNulls)`
  * over rows UNBOUNDED PRECEDING..CURRENT — linear in |L|+|R| after the
  * sort, no pair materialization, and the shuffle key is the join key so
  * skew maps to per-key cardinality (saltable upstream if one key dominates).
  *
  * Determinism: right rows sort before left rows at equal time (an
  * observation AT the probe instant is visible), and ties among right rows
  * resolve by `tieCol` — the carried row is exactly
  * argmax over {r : r.time <= l.time} of (r.time, r.tie), reproducible by
  * any engine.
  */
object AsOfJoin {

  /** @param rightValCols right columns carried onto each left row (emitted
    *                     as `asofPrefix + name`, null when no right row
    *                     precedes the left row)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightValCols: Seq[String],
      asofPrefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val lPayload = left.schema
    // SQL comparison semantics: a right row with a NULL time or NULL key
    // precedes nothing (`r.ts <= l.ts` is NULL) — drop it, or Spark's
    // nulls-first sort would carry it onto every left row. Left rows are
    // NEVER filtered (as-of preserves the left side; null-key left rows
    // just find no match once null-key right rows are gone).
    val rightClean = (timeCol +: keys).foldLeft(right) { (df, c) =>
      df.filter(col(c).isNotNull)
    }
    val rPayload = rightClean.select(rightValCols.map(col): _*).schema
    val l = left.select(keyCols ++ Seq(
      col(timeCol).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(right.schema(tieCol).dataType).as("__tie"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rPayload).as("__r")): _*)
    val r = rightClean.select(keyCols ++ Seq(
      col(timeCol).as("__t"),
      lit(0).as("__side"),
      col(tieCol).as("__tie"),
      lit(null).cast(lPayload).as("__l"),
      struct(rightValCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val carried = rightValCols.map(c =>
      col("__carried").getField(c).as(asofPrefix + c))
    joined.select(leftCols.toIndexedSeq ++ carried: _*)
  }
}
