package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** IVF (inverted-file) ANN index — the coarse-quantizer alternative to the
  * LSH scale path (SURVEY §7.3 step 6): k-means centroids partition the
  * corpus into cells; search scores only the `nProbe` cells nearest each
  * query.
  *
  * Training is Lloyd's iterations as pure dataflow: assign = broadcast the
  * (small) centroid set and argmax similarity per node (one map-side pass);
  * update = groupBy(cell) columnar mean via posexplode — shuffles only
  * (cell, dim-position, partial sums). Seeding is deterministic (hash-ranked
  * sample), so training is reproducible run-to-run.
  *
  * Scale: nodes never shuffle during assignment (centroids broadcast);
  * the per-iteration shuffle is O(n × dim) slim rows with map-side partial
  * aggregation; search cost is Q × (k centroids + n × nProbe / k).
  */
object IvfIndex {

  /** Externally-reproducible codebook: the k lowest-id live vectors, cells
    * numbered in id order. Unlike [[train]] (whose float mean accumulation
    * is engine-internal), this codebook is plain data selection — an
    * external engine can re-derive it from the same parquet, so IVF search
    * over it is oracle-checkable end-to-end. At scale this is the classic
    * sample-codebook IVF bootstrap: assignment + probing cost is identical
    * to a trained codebook; only cell balance differs. */
  def sampleCodebook(nodes: DataFrame, k: Int): DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    live.orderBy(col("id").asc).limit(k)
      .withColumn("cell",
        row_number().over(Window.orderBy(col("id").asc)) - 1)
      .select(col("cell"), col("vector").as("centroid"))
  }

  /** Deterministic seed centroids: the k nodes with smallest id hash. */
  private def seedCentroids(nodes: DataFrame, k: Int): DataFrame =
    nodes.withColumn("__h", xxhash64(col("id")))
      .orderBy(col("__h").asc, col("id").asc).limit(k)
      .withColumn("cell", row_number().over(
        Window.orderBy(col("__h").asc, col("id").asc)) - 1)
      .select(col("cell"), col("vector").as("centroid"))

  /** Deterministic k-means++-style seed centroids (Arthur & Vassilvitskii
    * 2007), batched for the distributed setting the way k-means|| batches
    * the sequential D² pass (Bahmani et al., VLDB 2012): start from the
    * lowest-id vector, then over `rounds` rounds sample a batch WITHOUT
    * replacement with probability ∝ D², where D = (1 − cos) angular
    * distance to the nearest already-chosen seed (the same metric
    * [[assign]] clusters with). The weighted sample uses
    * Efraimidis–Spirakis A-Res keys — rank by u^(1/D²) with u a
    * hash-derived uniform in (0,1) — so seeding is a pure function of the
    * data and the round number: deterministic across runs, partitionings
    * and cluster sizes. Each round is one broadcast join over the corpus
    * (seeds ≤ k rows — tiny): `rounds` map-side scans, scale-safe at any
    * corpus size. */
  def seedCentroidsPP(nodes: DataFrame, k: Int, rounds: Int = 8)
      : DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    var cb = live.orderBy(col("id").asc).limit(1)
      .select(lit(0).as("cell"), col("vector").as("centroid"))
      .localCheckpoint()
    var total = 1
    val batch = math.max(1, math.ceil((k - 1).toDouble / rounds).toInt)
    for (r <- 1 to rounds if total < k) {
      val take = math.min(batch, k - total)
      // the n×seeds D² pass stays NARROW (id, dd): min(double) is a
      // hash-aggregable primitive buffer, so the partial agg collapses
      // map-side with NO sort — carrying the vector through the agg
      // (first(array) forces SortAggregate) sorted n×seeds WIDE rows
      // and stalled the 384-dim ladder for 20+ min; the vector
      // re-attaches by id afterwards, one equi-join against one row/id
      val d2 = live.select(col("id"), col("vector"))
        .join(broadcast(cb))
        .withColumn("dd",
          lit(1.0) - VectorFunctions.cosineSim(col("vector"),
            col("centroid")))
        .groupBy(col("id"))
        .agg(min(col("dd")).as("d"))
        // zero-distance points are existing seeds (or colinear with one):
        // weight 0 under D² sampling, so drop instead of pow(u, 1/0)
        .filter(col("d") > 0)
        .join(live.select(col("id"), col("vector")), Seq("id"))
      val u = (pmod(xxhash64(col("id"), lit(r)), lit(1000000000L)) +
        lit(1)).cast("double") / lit(1000000001.0)
      // global top-take WITHOUT a single-partition window: orderBy+limit
      // plans TakeOrderedAndProject (partition-local top-take, then a
      // driver merge of take rows per partition) — the corpus-sized D²
      // table never funnels through one task. Cell numbering happens on
      // the ≤ take collected rows; the stable driver re-sort on the sample
      // key preserves the executed (skey desc, id asc) order for any
      // equal-key rows regardless of how the limit output is iterated.
      val sp = nodes.sparkSession
      import sp.implicits._
      val picked = d2
        .withColumn("skey", pow(u, lit(1.0) / (col("d") * col("d"))))
        .orderBy(col("skey").desc, col("id").asc)
        .limit(take)
        .select(col("skey"), col("vector"))
        .collect()
        .sortBy(r => -r.getDouble(0))
        .zipWithIndex
        .map { case (row, i) => (total + i, row.getSeq[Float](1)) }
        .toSeq.toDF("cell", "centroid")
      cb = cb.unionByName(picked).localCheckpoint()
      total += take
    }
    cb
  }

  /** [[train]] with k-means++-style initialization instead of the id-hash
    * sample — the cheapest coarse-quantizer quality lever: D² seeding
    * spreads initial centroids across the occupied space, so Lloyd starts
    * near a good partition and probe-budgeted recall rises (better cell
    * balance ⇒ true neighbors land in probed cells more often). */
  def trainPP(nodes: DataFrame, k: Int, iters: Int, rounds: Int = 8)
      : DataFrame = {
    val liveNodes =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    lloydLoop(liveNodes, seedCentroidsPP(liveNodes, k, rounds), iters)
  }

  /** Nearest-centroid assignment (cosine) as ONE map-side projection:
    * the codebook (k × dim floats — broadcast-tiny by construction)
    * rides a codegen'd argmax kernel
    * ([[graft.functions.NearestCodeExpr]]), so every node row computes
    * its cell in place — zero joined rows, zero sort, zero shuffle,
    * payload untouched on its own row.
    *
    * This replaces the join-then-`max_by` formulation: `max_by`'s
    * struct ordering key forces a SORT-based partial aggregate, so the
    * n × k scored rows — each CARRYING the node vector — flowed through
    * an UnsafeExternalSorter (measured: the 6 M × 64 flagship's 32-way
    * super-assign spilled > 75 GB and filled the probe host's disk; at
    * 200 k × 447 cells the even older window formulation shuffled
    * ~46 GB). The kernel scans cells in ascending-cell order with
    * strict improvement — exact-score ties keep the LOWEST cell, NaN
    * sims rank greatest — bit-identical assignments to the `max_by`
    * (sim, −cell) key (a04/a05 oracles + the AnnSpec equivalence test
    * pin this). */
  def assign(nodes: DataFrame, centroids: DataFrame): DataFrame = {
    val payload = nodes.columns.filterNot(_ == "id")
    val cents = centroids.select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    nodes.withColumn("cell", VectorFunctions.nearestCode(lit(0),
        col("vector"), Seq(cents.map(_._2).toSeq),
        Seq(cents.map(_._1).toSeq), "cosine"))
      .select((Seq("id") ++ payload ++ Seq("cell")).map(col).toIndexedSeq: _*)
  }

  /** Two-level nearest-centroid assignment — [[assign]]'s scale fix for
    * LARGE codebooks (the k = √n semantic pre-assign regime, where the
    * flat scan's n×k candidate volume is an n^1.5 term: the 6 M-doc
    * flagship measured it at 833.9 s vs 86.3 s at 3 M — SCALING.md).
    * Level 1 picks the nearest of ~√k SUPER-cells (a deterministic
    * sample of the fine centroids, n×√k candidates); level 2 argmaxes
    * over only that super-cell's fine centroids (n × k/√k expected) —
    * total ~2·n·√k. APPROXIMATE by design: a node whose true nearest
    * fine centroid lives in a neighboring super-cell assigns to the
    * best within its own (fine for cell-BLOCKING consumers — semantic
    * dedup pre-assigns, probe seeding — and the standard two-level
    * coarse-quantizer shape). Deterministic end-to-end: both levels
    * reuse [[assign]]'s (sim, −cell) tiebreak, and `superK = k`
    * degenerates to EXACTLY the flat assignment (spec-pinned). Output
    * contract identical to [[assign]]. */
  def assignHierarchical(nodes: DataFrame, centroids: DataFrame,
      superK: Int = 0): DataFrame = {
    val payload = nodes.columns.filterNot(_ == "id")
    // the WHOLE codebook is k × dim floats — collected once (the same
    // bound the broadcast formulation shipped to every executor) and
    // regrouped driver-side into per-super-cell sub-books
    val fine = centroids.select(col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
    val sk = math.min(fine.length,
      if (superK > 0) superK
      else math.max(4, math.ceil(math.sqrt(fine.length.toDouble)).toInt))
    // super codebook = [[sampleCodebook]] over the fine centroids (the
    // sk lowest-CELL centroids, super-cells numbered in cell order) —
    // the same derivation the DataFrame formulation used, computed on
    // the already-collected rows
    val superCents = fine.take(sk).map(_._2)
    // fine centroid → super cell, the kernel's own tie rules (a sampled
    // fine centroid lands in its own super-cell by self-similarity 1,
    // so every reachable sub-book is non-empty)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val s = dot / (math.sqrt(na) * math.sqrt(nb))
      if (java.lang.Double.isNaN(s)) 2.0 else s
    }
    val bySuper = fine.map { case (cell, cent) =>
      var best = 0; var bestKey = -3.0; var c = 0
      while (c < sk) {
        val k = cos(cent, superCents(c))
        if (k > bestKey) { best = c; bestKey = k }
        c += 1
      }
      (best, cell, cent)
    }.groupBy(_._1)
    val books = Seq.tabulate(sk)(s =>
      bySuper.getOrElse(s, Array.empty).sortBy(_._2).map(_._3).toSeq)
    val ids = Seq.tabulate(sk)(s =>
      bySuper.getOrElse(s, Array.empty).sortBy(_._2).map(_._2).toSeq)
    // both levels are map-side projections on the node's OWN row —
    // payload rides untouched; no joined rows, no sort, no shuffle
    // (the former join-then-max_by level passes sorted n×√k rows
    // carrying the node vector: > 75 GB of spill at 6 M × 64)
    nodes.withColumn("__scell", VectorFunctions.nearestCode(lit(0),
        col("vector"), Seq(superCents.map(_.toSeq).toSeq),
        Seq((0 until sk).toSeq), "cosine"))
      .withColumn("cell", VectorFunctions.nearestCode(col("__scell"),
        col("vector"), books.map(_.map(_.toSeq)), ids, "cosine"))
      .select((Seq("id") ++ payload ++ Seq("cell")).map(col).toIndexedSeq: _*)
  }

  /** Lloyd's k-means on the vector column; returns (cell, centroid).
    * Tombstoned rows don't participate. */
  def train(nodes: DataFrame, k: Int, iters: Int): DataFrame = {
    val liveNodes =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    lloydLoop(liveNodes, seedCentroids(liveNodes, k), iters)
  }

  /** Shared Lloyd loop: assign (broadcast argmax) + per-(cell, pos) mean;
    * cells that lose all members keep their previous centroid. */
  private def lloydLoop(liveNodes: DataFrame, init: DataFrame, iters: Int)
      : DataFrame = {
    var centroids = init.localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assign(liveNodes, centroids)
      val newCentroids = assigned
        .select(col("cell"), posexplode(col("vector")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m").cast("float")).as("centroid"))
      // cells that lost all members keep their previous centroid
      centroids = centroids.select(col("cell"), col("centroid").as("old"))
        .join(newCentroids, Seq("cell"), "left_outer")
        .select(col("cell"), coalesce(col("centroid"), col("old")).as("centroid"))
        .localCheckpoint()
    }
    centroids
  }

  /** One Lloyd refinement step with ORDER-FORCED per-component means:
    * members of each (cell, dim) are summed sequentially in id order
    * (collect → sort → left-fold), so the result is bit-reproducible by any
    * engine with a sequential list reduce — the verifiability twin of
    * [[train]]'s parallel mean. Returns (cell, pos, m): the refined
    * centroid components.
    *
    * Scale note: the per-(cell, pos) collect_list is bounded by cell size —
    * at 100 TB use [[train]] (map-side partial avg, no per-group
    * materialization) and keep THIS path for small verification samples;
    * forcing a summation order is fundamentally at odds with parallel
    * reduction, so the exactness/scale trade is explicit. */
  def lloydIterOrdered(nodes: DataFrame, codebook: DataFrame): DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    assign(live, codebook)
      .select(col("cell"), col("id"),
        posexplode(col("vector")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(
        aggregate(array_sort(collect_list(struct(col("id"), col("x")))),
          lit(0.0),
          (acc, e) => acc + e.getField("x").cast("double")).as("s"),
        count(lit(1)).as("cnt"))
      .select(col("cell"), col("pos"),
        (col("s") / col("cnt")).as("m"))
  }

  /** Probed (query_id, query_vec, cell) rows — THE probe stage every
    * IVF-probed arm shares (plain IVF, IVF-PQ raw/residual, IVF-SQ8,
    * IVF-BQ, and the seeded-graph hybrid through [[IvfIndex.search]]):
    * rank the centroids per query by cosine, keep the top `nProbe`.
    *
    * `matchingCells` (set when a pre-filter is at play) restricts the
    * RANKED set to cells that still CONTAIN matching members — the
    * CORRELATED-predicate guard. A predicate aligned with the data's
    * cluster structure (search-within-source where sources are
    * geometrically clustered — the common production shape) leaves the
    * query's nearest cells EMPTY after filtering, and a rank over all
    * cells then probes nothing but empty ones: measured recall 0.0 at
    * ANY fixed budget, and still 0.0 at an 18%-of-cells escalated
    * budget (FilterProbe escalation mode, 200 k×64 cluster fixture).
    * Ranking only non-empty cells makes `nProbe` count cells that can
    * contribute, and with selectivity escalation the two regimes BOTH
    * serve: a uniform filter keeps every cell (identical plan to the
    * unrestricted rank) and escalation fills the per-cell deficit; a
    * cluster-aligned filter keeps ~cells × selectivity cells and the
    * escalated budget covers them all — exact over the filtered set.
    * The price is one narrow distinct over the ALREADY-restricted
    * membership — O(filtered) rows, the scan the arm pays anyway. */
  private[operators] def probeCells(queries: DataFrame,
      centroids: DataFrame, nProbe: Int,
      matchingCells: Option[DataFrame]): DataFrame = {
    // a NULL query_vec would vanish silently from BOTH arms (topCells
    // returns null and explode drops the row; the filtered arm's
    // cosineSim goes null and the rank filter drops it) — callers
    // reaching the operator directly (bypassing VectorStore.validate)
    // would read an empty result as "no matches". Fail loudly instead;
    // assert_true returns null when the check passes, so the filter
    // keeps every valid row and cannot be pruned away.
    val checked = queries.filter(assert_true(col("query_vec").isNotNull,
      lit("IvfIndex.probeCells: NULL query_vec — validate queries " +
        "upstream")).isNull)
    probeCellsChecked(checked, centroids, nProbe, matchingCells)
  }

  private def probeCellsChecked(queries: DataFrame,
      centroids: DataFrame, nProbe: Int,
      matchingCells: Option[DataFrame]): DataFrame = matchingCells match {
    case Some(mc) =>
      // FILTERED ranking (the correlated-predicate guard): the occupied
      // cell set is data-dependent, so it stays a join + per-query rank
      // — but over the filter-SHRUNK centroid subset, which is the
      // regime where the rank input is small by construction
      val ranked = centroids.join(
        mc.select(col("cell")).distinct(), Seq("cell"), "left_semi")
      val cw = Window.partitionBy(col("query_id"))
        .orderBy(col("__csim").desc, col("cell").asc)
      queries.join(broadcast(ranked))
        .withColumn("__csim",
          VectorFunctions.cosineSim(col("query_vec"), col("centroid")))
        .withColumn("__crn", row_number().over(cw))
        .filter(col("__crn") <= nProbe)
        .select(col("query_id"), col("query_vec"), col("cell"))
    case None =>
      // UNFILTERED: the centroid table is literal-sized (k × dim
      // floats), so the top-nProbe selection runs on the query's OWN
      // row ([[graft.functions.TopCellsExpr]] — rank parity with the
      // window formulation spec-pinned) and explodes to the probe
      // list. The former join-then-window ranked Q × k rows carrying
      // the query vector through a per-query sort — at Q = 100 k ×
      // 1024 cells it was the probe-selection wall of the
      // QueryBatchProbe ladder.
      val cents = centroids.select(col("cell"), col("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1)
      queries.select(col("query_id"), col("query_vec"),
        explode(VectorFunctions.topCells(col("query_vec"),
          cents.map(_._2.toSeq).toSeq, cents.map(_._1).toSeq, nProbe))
          .as("cell"))
  }

  /** ANN search: rank centroids per query, probe the top `nProbe` cells,
    * exact-score only their members. Output shape matches knnExact.
    * `idFilter` pre-filters the member table BEFORE the probe join
    * ([[KnnSearch.restrictIds]] — selective predicates shrink the
    * scored set), and the probed ranking runs over the cells the
    * filtered members actually occupy ([[probeCells]] — the
    * correlated-predicate guard). */
  def search(nodes: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, minSim: Double, nProbe: Int,
      assignments: Option[DataFrame] = None,
      idFilter: Option[DataFrame] = None,
      broadcastBytes: Long = 64L << 20): DataFrame = {
    // tombstones excluded like every other search path (hnsw.ts:292)
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    // cell assignment is O(n x cells): reuse a persisted assignment from
    // build time when provided instead of recomputing per search. The
    // restriction lands on the member table (or, absent a persisted
    // assignment, on the nodes BEFORE assigning — the filtered fraction
    // never pays the O(n x cells) argmax either)
    val members = assignments
      .map(a => KnnSearch.restrictIds(a, idFilter))
      .getOrElse(assign(KnnSearch.restrictIds(live, idFilter), centroids))
      .select(col("cell"), col("id"), col("vector"))
    val probed = probeCells(queries, centroids, nProbe,
      idFilter.map(_ => members))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    // the probed table is Q × nProbe rows CARRYING the query vector (and
    // escalation can raise nProbe to `cells`): size-gate the broadcast
    // (the [[KnnSearch.knnExact]] rule) so a large query batch falls
    // back to a plain shuffled equi-join on `cell` instead of pinning
    // Q-proportional state in every executor / tripping the driver's
    // broadcast ceiling
    members.join(KnnSearch.maybeBroadcast(probed, broadcastBytes),
      Seq("cell"))
      // barrier: one kernel evaluation per probed member (KnnSearch rule)
      .withColumn("score", VectorFunctions.once(
        VectorFunctions.cosineSim(col("query_vec"), col("vector"))))
      .filter(col("score") > lit(minSim) && !isnan(col("score")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id"), col("score"), col("rn"))
  }
}
