package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, ONE right row from the same key group
  * chosen by temporal proximity: [[backward]] picks the latest right row
  * with `right.time <= left.time` ("latest observation carried forward"),
  * [[forward]] the earliest right row with `right.time >= left.time`
  * (the next-observation attribution), both optionally bounded by a
  * `toleranceSec` window (the pandas `merge_asof` / kdb `aj` surface).
  * The temporal-attribution primitives a training-data pipeline needs
  * that Spark has no native operator for.
  *
  * NOT implemented as an inequality join: Catalyst plans `l.ts >= r.ts` as a
  * broadcast-nested-loop (O(|L|·|R|) comparisons and a broadcast of a whole
  * side). Instead: union both sides, one shuffle on the keys, sort each
  * group by (time, side, tiebreak), and run `last(right_payload, ignoreNulls)`
  * over rows UNBOUNDED PRECEDING..CURRENT — linear in |L|+|R| after the
  * sort, no pair materialization, and the shuffle key is the join key so
  * skew maps to per-key cardinality (saltable upstream if one key dominates).
  * The tolerance is a post-mask on the carried row (never a join
  * condition), so the plan shape is identical with or without it.
  *
  * Determinism: right rows sort before left rows at equal time (an
  * observation AT the probe instant is visible in BOTH directions), and
  * ties among right rows resolve by `tieCol` — backward carries
  * argmax over {r : r.time <= l.time} of (r.time, r.tie), forward
  * argmin of (r.time, r.tie), reproducible by any engine.
  */
object AsOfJoin {

  /** Backward as-of: latest `right.time <= left.time` per key; with
    * `toleranceSec`, only within `left.time - tolerance` (timeCol must
    * then be a timestamp).
    *
    * @param rightValCols right columns carried onto each left row (emitted
    *                     as `asofPrefix + name`, null when no right row
    *                     qualifies)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightValCols: Seq[String],
      asofPrefix: String = "asof_",
      toleranceSec: Option[Long] = None): DataFrame =
    asofImpl(left, right, keys, timeCol, tieCol, rightValCols, asofPrefix,
      back = true, toleranceSec)

  /** Forward as-of: earliest `right.time >= left.time` per key; with
    * `toleranceSec`, only within `left.time + tolerance`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightValCols: Seq[String],
      asofPrefix: String = "asof_",
      toleranceSec: Option[Long] = None): DataFrame =
    asofImpl(left, right, keys, timeCol, tieCol, rightValCols, asofPrefix,
      back = false, toleranceSec)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String, rightValCols: Seq[String],
      asofPrefix: String, back: Boolean,
      toleranceSec: Option[Long]): DataFrame = {
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
    // the carried struct includes the right TIME (as __rt) so the
    // tolerance mask can compare it against the left row's instant
    val rStructCols = col(timeCol).as("__rt") +: rightValCols.map(col)
    val rPayload = rightClean.select(rStructCols: _*).schema
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
      struct(rStructCols: _*).as("__r")): _*)
    // scan order: backward ascends time (last-seen right = latest <= t,
    // tie asc scanned last wins = max tie); forward DESCENDS time
    // (last-seen right = earliest >= t, tie desc scanned last wins =
    // MIN tie). Right before left at equal time in both. NULL-time LEFT
    // rows (right NULLs are filtered above) must scan before every right
    // row in BOTH directions so they carry nothing — `NULL >= t` never
    // qualifies — hence nulls-first on the descending forward order too
    // (plain desc is nulls-LAST, which would scan a NULL-time left row
    // after the whole group and wrongly attach the earliest right row).
    val ord =
      if (back) Seq(col("__t").asc_nulls_first, col("__side").asc,
        col("__tie").asc)
      else Seq(col("__t").desc_nulls_first, col("__side").asc,
        col("__tie").desc)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val ok = toleranceSec match {
      case None => col("__carried").isNotNull
      case Some(tol) =>
        val diff =
          if (back) unix_micros(col("__t")) -
            unix_micros(col("__carried").getField("__rt"))
          else unix_micros(col("__carried").getField("__rt")) -
            unix_micros(col("__t"))
        col("__carried").isNotNull && diff <= tol * 1000000L
    }
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val carried = rightValCols.map(c =>
      when(ok, col("__carried").getField(c)).otherwise(lit(null))
        .as(asofPrefix + c))
    joined.select(leftCols.toIndexedSeq ++ carried: _*)
  }
}
