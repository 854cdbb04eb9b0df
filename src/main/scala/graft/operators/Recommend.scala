package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recommendation by example points — the vector-DB "discovery" API:
  * the caller names LIKED and DISLIKED points already in the store
  * (no query vector of their own), and the engine searches with
  *
  *   query = mean(positive vectors) − mean(negative vectors)
  *
  * excluding the example points from the results — "more like these,
  * less like those" over the corpus itself. The reference engine only
  * searches by an explicit vector (`driver/driver.ts:290-307`); this
  * derives that vector from stored points, the serving shape next to
  * [[Diversify]]'s re-ranks.
  *
  * Scale: the examples relation is tiny by construction (a handful of
  * ids per query), so deriving the query vectors is an example-sized
  * equi-join against the node table plus one per-query fold — nothing
  * corpus-sized moves. Scoring is the shared [[KnnSearch.scoreAll]]
  * pass (broadcast-gated derived queries over the full node table),
  * and the example exclusion is an anti-join BEFORE the rank windows —
  * post-rank exclusion would return short pages with skipped ranks.
  *
  * DETERMINISM: the centroid folds example vectors in id-ASCENDING
  * order (`array_sort` on (id, w, v) structs — id is the leading
  * field), each element promoted float→double exactly and accumulated
  * sequentially, so the derived vector is bit-identical on any engine
  * that folds the same sorted list (the v18 oracle mirrors the fold
  * with `list_sort` + `list_reduce`); the final per-element
  * double→float cast is IEEE round-to-nearest in both.
  */
object Recommend {

  /** Search by example points. `examples` columns: (query_id, id,
    * weight) — weight's SIGN picks the group (> 0 liked, < 0
    * disliked; magnitudes are not used). Queries must have at least
    * one positive example whose id exists in `nodes` — a query with
    * none fails loudly (the probeCells rule: a silent empty result
    * would read as "no matches"). Output: (query_id, id, score, rn),
    * example points excluded. */
  def byExamples(
      nodes: DataFrame,
      examples: DataFrame,
      k: Int,
      minSim: Double = -2.0,
      metric: String = "cosine",
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val exv = examples
      .select(col("query_id"), col("id"), col("weight"))
      .join(nodes.select(col(idCol).as("id"), col(vecCol).as("vector")),
        Seq("id"))
    val packed = exv.groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("id"), col("weight").as("w"),
        col("vector").as("v")))).as("exs"))
    val pos = filter(col("exs"), e => e.getField("w") > lit(0.0))
    val neg = filter(col("exs"), e => e.getField("w") < lit(0.0))
    def meanAt(lst: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column) =
      aggregate(lst, lit(0.0d), (acc, e) =>
        acc + element_at(e.getField("v"), j + 1).cast("double")) /
        size(lst).cast("double")
    val dim = size(element_at(col("exs"), 1).getField("v"))
    val centroid = transform(sequence(lit(0), dim - 1), j =>
      (meanAt(pos, j) -
        when(size(neg) > 0, meanAt(neg, j)).otherwise(lit(0.0d)))
        .cast("float"))
    val queriesDf = packed
      // loud contract: no positive examples → no derivable query (the
      // probeCells rule — assert_true inside a filter survives the
      // optimizer and raises instead of silently emitting garbage)
      .filter(assert_true(size(pos) > 0,
        lit("recommend query lacks positive examples present in nodes"))
        .isNull)
      .select(col("query_id"), centroid.as("query_vec"))
    // the derived query relation is an aggregate over a join, so the
    // Catalyst stats gate sees the default (huge) size estimate and
    // scoreAll would fall back to the 2×-wall replicated-NL path
    // (DiversifyProbe) — size it for real: query count from the tiny
    // examples relation, dim from one resolved example row (limit(1)
    // terminates the broadcast-joined scan at the first hit)
    val qEst = examples.select(col("query_id")).distinct().count()
    val dimRow = exv.select(size(col("vector")).as("d")).limit(1)
      .collect().headOption
    val qBytes = dimRow.map(r => qEst * (24L + 4L * r.getInt(0)))
      .getOrElse(0L)
    val scored = KnnSearch.scoreAll(nodes, queriesDf, minSim, metric,
      idCol, vecCol, broadcastBytes = broadcastBytes,
      queriesSmallHint = Some(qBytes <= broadcastBytes))
    // exclude the example points BEFORE ranking (exact page semantics)
    val excl = scored.join(
      examples.select(col("query_id"), col("id").as(idCol)),
      Seq("query_id", idCol), "left_anti")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    excl
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col(idCol).as("id"), col("score"), col("rn"))
  }
}
