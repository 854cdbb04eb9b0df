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
  * ids per query), so it is locally checkpointed ONCE at entry — one
  * example-sized materialization that (a) pins a nondeterministic
  * source to one snapshot (centroid, stats and exclusion all read the
  * same rows), and (b) makes the vector re-attach ONE broadcast-join
  * scan over the node table instead of one per consumer. Deriving the
  * query vectors is then driver-local arithmetic, and the derived
  * relation is re-created as a LOCAL relation when it fits the
  * broadcast budget — so every downstream stats gate ([[KnnSearch
  * .scoreAll]]'s, any index arm's) sees the TRUE size instead of
  * Catalyst's default estimate for an aggregate-over-join (the
  * DiversifyProbe replicated-NL finding). Scoring is the shared
  * [[KnnSearch.scoreAll]] pass, and the example exclusion is an
  * anti-join BEFORE the rank windows — post-rank exclusion would
  * return short pages with skipped ranks.
  *
  * DETERMINISM: the centroid folds example vectors in id-ASCENDING
  * order (`array_sort` on (id, w, v) structs — id is the leading
  * field), each element promoted float→double exactly and accumulated
  * sequentially, so the derived vector is bit-identical on any engine
  * that folds the same sorted list (the v18 oracle mirrors the fold
  * with `list_sort` + `list_reduce`); the final per-element
  * double→float cast is IEEE round-to-nearest in both. Collecting the
  * derived relation and re-emitting it as a local one preserves the
  * float bits exactly.
  */
object Recommend {

  /** The derived-query bundle [[derive]] returns: `ex` is the
    * checkpointed (query_id, id, weight) snapshot (the exclusion
    * side), `queries` the derived (query_id, query_vec) relation —
    * a LOCAL relation when `small` —, `qCount` the number of derivable
    * queries, and `maxPerQuery` the largest RESOLVED example count of
    * any query (the over-fetch depth an arm needs so exclusion still
    * leaves k rows). */
  private[graft] final case class DerivedQueries(
      ex: DataFrame, queries: DataFrame, qCount: Long, maxPerQuery: Int,
      small: Boolean)

  /** Derive the per-query centroid vectors from stored example points.
    * `examples` columns: (query_id, id, weight) — weight's SIGN picks
    * the group (> 0 liked, < 0 disliked; magnitudes are not used).
    * Every query must have at least one positive example whose id
    * exists in `nodes` — a query with none, INCLUDING one whose ids
    * all miss the node table, fails loudly (the probeCells rule: a
    * silent empty result would read as "no matches"). The loud check
    * fires at derive time when the relation localizes, else at the
    * first downstream action. */
  private[graft] def derive(
      nodes: DataFrame,
      examples: DataFrame,
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20): DerivedQueries = {
    // ONE snapshot of the (tiny) examples source for every consumer
    val ex = examples.select(col("query_id"), col("id"), col("weight"))
      .localCheckpoint()
    // ONE broadcast-join scan of the node table to resolve vectors;
    // checkpointing the (examples-sized) result makes the centroid,
    // stats and packing jobs local re-reads instead of corpus re-scans
    val exv = ex
      .join(nodes.select(col(idCol).as("id"), col(vecCol).as("vector")),
        Seq("id"))
      .localCheckpoint()
    // one job: query count, deepest per-query example count, dim
    val st = exv.groupBy(col("query_id"))
      .agg(count(lit(1)).as("c"), max(size(col("vector"))).as("d"))
      .agg(count(lit(1)).as("q"), max(col("c")).as("mx"),
        max(col("d")).as("dim"))
      .head()
    val (qCount, maxPer, dim) =
      if (st.isNullAt(2)) (0L, 0, 0)
      else (st.getLong(0), st.getLong(1).toInt, st.getInt(2))
    val agg = exv.groupBy(col("query_id"))
      .agg(array_sort(collect_list(struct(col("id"),
        col("weight").as("w"), col("vector").as("v")))).as("exs"))
    // left-join ALL example query_ids into the packed relation: a query
    // whose ids ALL miss the node table produces no agg row and would
    // otherwise silently vanish instead of raising (its exs is null →
    // the positive-examples assert below fires for it too)
    val packed = ex.select(col("query_id")).distinct()
      .join(agg, Seq("query_id"), "left")
    val pos = filter(col("exs"), e => e.getField("w") > lit(0.0))
    val neg = filter(col("exs"), e => e.getField("w") < lit(0.0))
    def meanAt(lst: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column) =
      aggregate(lst, lit(0.0d), (acc, e) =>
        acc + element_at(e.getField("v"), j + 1).cast("double")) /
        size(lst).cast("double")
    val dimC = size(element_at(col("exs"), 1).getField("v"))
    val centroid = transform(sequence(lit(0), dimC - 1), j =>
      (meanAt(pos, j) -
        when(size(neg) > 0, meanAt(neg, j)).otherwise(lit(0.0d)))
        .cast("float"))
    val queriesDf = packed
      // loud contract: no positive examples resolvable in nodes → no
      // derivable query (the probeCells rule — assert_true inside a
      // filter survives the optimizer and raises instead of silently
      // emitting garbage; coalesce pins the null-exs case to false)
      .filter(assert_true(coalesce(size(pos) > 0, lit(false)),
        lit("recommend query lacks positive examples present in nodes"))
        .isNull)
      .select(col("query_id"), centroid.as("query_vec"))
    val qBytes = qCount * (24L + 4L * dim)
    if (qBytes <= broadcastBytes) {
      // localize: one collect over the checkpointed examples-sized
      // relation (this also evaluates the loud contract NOW), then a
      // LocalRelation whose stats every downstream broadcast gate reads
      // exactly — float bits survive the round-trip unchanged
      val rows = queriesDf.collect()
      val local = nodes.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), queriesDf.schema)
      DerivedQueries(ex, local, qCount, maxPer, small = true)
    } else DerivedQueries(ex, queriesDf, qCount, maxPer, small = false)
  }

  /** Shared tail: drop the example points, then rank — exclusion BEFORE
    * the window (post-rank exclusion returns short pages with skipped
    * ranks). `cands` needs (query_id, id, score); any extra columns
    * (an arm's rn) are dropped and ranks recomputed. */
  private[graft] def rankExcluding(cands: DataFrame, ex: DataFrame,
      k: Int): DataFrame = {
    val excl = cands.select(col("query_id"), col("id"), col("score"))
      .join(ex.select(col("query_id"), col("id")),
        Seq("query_id", "id"), "left_anti")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    excl
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("score"), col("rn"))
  }

  /** Search by example points over the EXACT tower. Output:
    * (query_id, id, score, rn), example points excluded. */
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
    val d = derive(nodes, examples, idCol, vecCol, broadcastBytes)
    val scored = KnnSearch.scoreAll(nodes, d.queries, minSim, metric,
      idCol, vecCol, broadcastBytes = broadcastBytes,
      queriesSmallHint = Some(d.small))
    rankExcluding(scored.withColumnRenamed(idCol, "id"), d.ex, k)
  }

  /** [[byExamples]] with the scoring stage supplied by ANY serving arm
    * — the scale path past the exact cutoff (the [[Diversify
    * .mmrFromCandidates]] composition rule applied to recommendation):
    * `serve(queries, fetchK)` receives the derived (query_id,
    * query_vec) relation and the over-fetch depth (k + the deepest
    * per-query example count, so exclusion still leaves k rows) and
    * returns at least (query_id, id, score) candidates. Results follow
    * the arm's usual shortlist-recall contract; the derivation,
    * exclusion and ranking are identical to [[byExamples]]. */
  def byExamplesWith(
      nodes: DataFrame,
      examples: DataFrame,
      k: Int,
      idCol: String = "id",
      vecCol: String = "vector",
      broadcastBytes: Long = 64L << 20)(
      serve: (DataFrame, Int) => DataFrame): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val d = derive(nodes, examples, idCol, vecCol, broadcastBytes)
    rankExcluding(serve(d.queries, k + d.maxPerQuery), d.ex, k)
  }
}
