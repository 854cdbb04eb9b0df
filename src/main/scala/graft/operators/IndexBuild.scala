package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Index parameters — the reference's constructor surface (`hnsw.ts:22-37`):
  * M = max neighbors per level, efConstruction = build beam, metric ∈
  * {cosine, euclidean}, d = dimension (validated, not inferred —
  * `hnsw.ts:157-160`). Persisted in the metadata sidecar so a reloaded index
  * keeps its metric (the reference loses it on reload — `hnsw.ts:794-796`,
  * a bug we fix rather than replicate).
  */
case class IndexParams(
    m: Int = 16,
    efConstruction: Int = 200,
    metric: String = "cosine",
    dim: Int = 64,
    levelMax: Int = 7,
    bucketBits: Int = 8,
    nBands: Int = 4,
    /** Max nodes compared within one LSH bucket chunk: a hot bucket (dense
      * similarity cluster) is split into ring-overlapped chunks of this
      * size, bounding candidate pairs at O(members × chunk) instead of
      * O(bucket²). */
    bucketChunk: Int = 64,
    /** Cell width `r` of the p-stable (L2) hash family used when
      * `metric = "euclidean"` — in DATA units: two points closer than ~r/2
      * usually share a cell per projection. Tune to the expected near-dup
      * distance; irrelevant for cosine (sign-bit family has no width). */
    bucketWidth: Double = 4.0,
    seed: Long = 42L)

/** Distributed ANN index construction — the batch-native replacement for
  * sequential HNSW insertion (`hnsw.ts:82-147`, `hnsw.ts:769-779`).
  *
  * Per level L (levels assigned geometrically, every node on layers 0..its
  * level): candidate pairs come from OR-of-`nBands` random-hyperplane LSH
  * buckets (equi-joins, never all-pairs), are scored with the codegen'd
  * similarity kernel, ranked top-M per source (window group-limit), unioned
  * with their reversals for bidirectionality, and re-shrunk to M — the
  * `selectNeighbors`/`addBidirectionalConnections`/`shrinkConnectionsIfNeeded`
  * semantics (`hnsw.ts:419-489`) as set-at-a-time dataflow.
  *
  * Scale notes: the only shuffles are per-band bucket joins (keys are
  * hyperplane sign patterns — AQE handles skewed buckets) and the per-src
  * top-M rank. Upper layers thin out 16× per level, so their joins are
  * negligible; layer 0 dominates and is linear in Σ bucket².
  * Insert-order-free by construction — tests assert recall, not graph
  * isomorphism (SURVEY §7.5).
  */
object IndexBuild {

  /** Deterministic geometric level: trailing base-16 zeros of an id hash
    * (P(level ≥ k) = 16^-k — the intended `selectLevel` distribution,
    * `hnsw.ts:51-77`, seeded by id instead of Math.random so builds are
    * reproducible). Pure integer arithmetic. */
  def levelOf(id: Column, levelMax: Int = 7): Column = {
    val h = id * 2654435761L + 104729L
    (1 to levelMax).foldLeft(lit(0)) { (acc, k) =>
      when(h % math.pow(16L, k).toLong === 0, k).otherwise(acc)
    }
  }

  /** Deterministic pseudo-uniform in [-1, 1] from (seed, plane, dim) — a
    * splitmix64-style integer mix, reproducible across JVMs (no
    * java.util.Random stream dependence). */
  private def mix(seed: Long, a: Long, b: Long): Double = {
    var z = seed + a * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Random hyperplanes for one LSH band: `bits` planes × `dim` components. */
  def hyperplanes(params: IndexParams, band: Int): Array[Array[Float]] =
    Array.tabulate(params.bucketBits) { p =>
      Array.tabulate(params.dim) { j =>
        mix(params.seed + band * 1000003L, p, j).toFloat
      }
    }

  /** Bucket key of `vec` under one band's projections, dispatched by
    * metric: sign-bit random-hyperplane LSH for cosine (P(same bit) =
    * 1 − angle/π); p-stable integer cells (Datar et al., E2LSH) for
    * euclidean — the sign-bit family ignores vector NORMS, so on
    * non-normalized data it has no recall guarantee for L2 neighbors. */
  def bucketKey(vec: Column, params: IndexParams, band: Int): Column =
    if (params.metric == "euclidean") euclideanBucketKey(vec, params, band)
    else cosineBucketKey(vec, params, band)

  /** Sign-bit bucket key (cosine family). */
  def cosineBucketKey(vec: Column, params: IndexParams, band: Int): Column = {
    val planes = hyperplanes(params, band)
    val bits = planes.map { w =>
      when(VectorFunctions.dotProduct(vec, typedLit(w.toSeq)) >= 0, "1")
        .otherwise("0")
    }
    concat(lit(s"$band:") +: bits.toIndexedSeq: _*)
  }

  /** Gaussian projections + uniform cell offsets for one p-stable band —
    * Box–Muller over the same seeded splitmix stream as [[hyperplanes]]
    * (reproducible across JVMs). */
  def pstableProjections(params: IndexParams, band: Int)
      : (Array[Array[Float]], Array[Double]) = {
    // uniform (0,1] from the mix stream (offset the seed so the Gaussian
    // stream never aliases the sign-bit planes of the same band)
    def u(a: Long, b: Long): Double =
      math.max(1e-12, (mix(params.seed + band * 1000003L + 500009L, a, b) + 1.0) / 2.0)
    val planes = Array.tabulate(params.bucketBits) { p =>
      Array.tabulate(params.dim) { j =>
        (math.sqrt(-2.0 * math.log(u(2L * p, j)))
          * math.cos(2.0 * math.Pi * u(2L * p + 1, j))).toFloat
      }
    }
    val offsets = Array.tabulate(params.bucketBits) { p =>
      u(4L * params.bucketBits + p, 0L) * params.bucketWidth
    }
    (planes, offsets)
  }

  /** p-stable (L2) bucket key for one band: floor((v·w + off) / r) per
    * projection, concatenated. v·w is N(0, ‖v‖²)-distributed per the
    * 2-stability of the Gaussian, so P(two points share a cell) decays
    * with their L2 distance — the guarantee the euclidean metric needs. */
  def euclideanBucketKey(vec: Column, params: IndexParams, band: Int): Column = {
    val (planes, offsets) = pstableProjections(params, band)
    val cells = planes.zip(offsets).map { case (w, off) =>
      floor((VectorFunctions.dotProduct(vec, typedLit(w.toSeq)) + off)
        / params.bucketWidth).cast("long").cast("string")
    }
    concat_ws(",", lit(s"$band:") +: cells.toIndexedSeq: _*)
  }

  /** All bands' bucket keys in ONE projection (band-prefixed so keys from
    * different bands never collide) — callers posexplode this instead of
    * scanning the input once per band. */
  def bucketKeys(vec: Column, params: IndexParams): Column =
    array((0 until params.nBands).map(b => bucketKey(vec, params, b)): _*)

  /** Full index build (`buildIndex`, `hnsw.ts:769-779`): level assignment +
    * per-level kNN graph, built in ONE dataflow pass. Each node explodes
    * into its layer memberships (a node at level l lives on layers 0..l —
    * geometric levels mean the explode only grows data by ~1/(1−1/16)),
    * bucket joins key on (layer, band bucket), and a single window ranks
    * top-M per (layer, src). No per-level driver loop: levels × bands of
    * separate small jobs collapse into `nBands` joins + 2 windows total.
    *
    * Input: (id, vector[, deleted]). Returns
    * (nodes(id, vector, level, deleted), edges(level, src, dst, score)). */
  def build(nodes: DataFrame, params: IndexParams): (DataFrame, DataFrame) =
    buildKeyed(nodes, params, v => bucketKeys(v, params), portableOrder = false)

  /** [[build]] with data-derived anchor hyperplanes (the a01 trick,
    * [[AnnSearch.anchorBucketKeys]]) and id-ordered bucket chunking: every
    * structural choice — bucket keys, chunk membership, neighbor ranks — is
    * re-derivable by an external engine from the same parquet, so the WHOLE
    * graph build is DuckDB-oracle-checkable, not just rows-only. Same
    * dataflow, same scale bounds; the seeded-random default stays the
    * production path (anchor quality depends on the sampled rows). */
  def buildAnchored(nodes: DataFrame, params: IndexParams,
      anchors: Seq[Seq[Array[Float]]]): (DataFrame, DataFrame) =
    buildKeyed(nodes, params, v => AnnSearch.anchorBucketKeys(v, anchors),
      portableOrder = true)

  private def buildKeyed(nodes: DataFrame, params: IndexParams,
      keyFn: Column => Column, portableOrder: Boolean): (DataFrame, DataFrame) = {
    val scoreFn: (Column, Column) => Column = params.metric match {
      case "euclidean" => VectorFunctions.euclideanSim
      case _ => VectorFunctions.cosineSim
    }
    val withDel =
      if (nodes.columns.contains("deleted")) nodes
      else nodes.withColumn("deleted", lit(false))
    val live = withDel.filter(!col("deleted"))
      .withColumn("level", levelOf(col("id"), params.levelMax))
    // one scan: every node row expands to (layer × band-key) join rows.
    // Hot-bucket bound: rank members within each bucket (deterministic
    // hash order) and let each belong to ring-overlapping chunks c and c+1
    // of `bucketChunk` ranks — any two members whose chunks overlap meet,
    // so every node still sees ~2×bucketChunk neighbors, but a bucket of
    // size S costs O(S × bucketChunk) pairs, never O(S²). Dense similarity
    // clusters (the LSH worst case — all mutual near-neighbors) stay
    // linear, and the graph quality loss is minimal exactly because such
    // buckets are mutually similar.
    // chunk rank order: hashed ids (uniform chunks) by default; plain id
    // order when an external oracle must re-derive the chunking
    val chunkOrder: Seq[Column] =
      if (portableOrder) Seq(col("id").asc)
      else Seq(xxhash64(col("id")).asc, col("id").asc)
    val bucketW = Window.partitionBy(col("layer"), col("b"))
      .orderBy(chunkOrder: _*)
    // rank on NARROW rows (layer, bucket, id): a window buffers whole
    // partition frames in execution memory, and dim-width vectors in those
    // frames is what blows the budget on hot buckets — vectors re-attach
    // by an id equi-join after chunking
    val membership = live
      .withColumn("layer", explode(sequence(lit(0), col("level"))))
      .withColumn("b", explode(keyFn(col("vector"))))
      .select(col("layer"), col("b"), col("id"))
      .withColumn("r", row_number().over(bucketW) - 1)
      .withColumn("chunk", explode(array(
        (col("r") / params.bucketChunk).cast("int"),
        (col("r") / params.bucketChunk).cast("int") + 1)))
      .withColumn("b", concat(col("b"), lit("#"), col("chunk")))
      .select(col("layer"), col("b"), col("id"))
    val members = membership
      .join(live.select(col("id"), col("vector")), Seq("id"))
      .select(col("layer"), col("b"), col("id"), col("vector"))
    // score in the join projection, THEN dedup multi-band hits via
    // groupBy-max on (layer, src, dst): the dedup shuffle carries 3 keys +
    // a double instead of two dim-width vectors (scoring a duplicate pair
    // ≤ nBands−1 extra times is far cheaper than shuffling its vectors)
    val scored = members
      .select(col("layer"), col("b"), col("id").as("src"),
        col("vector").as("src_vec"))
      .join(members.select(col("layer"), col("b"), col("id").as("dst"),
        col("vector").as("dst_vec")), Seq("layer", "b"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score", scoreFn(col("src_vec"), col("dst_vec")))
      .groupBy(col("layer"), col("src"), col("dst"))
      .agg(max(col("score")).as("score"))
    val w = Window.partitionBy(col("layer"), col("src"))
      .orderBy(col("score").desc, col("dst").asc)
    val directed = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= params.m).drop("rn")
    // bidirectional union + dedup, then shrink back to M (hnsw.ts:436-489)
    val undirected = directed
      .unionByName(directed.select(col("layer"), col("dst").as("src"),
        col("src").as("dst"), col("score")))
      .groupBy(col("layer"), col("src"), col("dst"))
      .agg(max(col("score")).as("score"))
    val edges = undirected.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= params.m)
      .select(col("layer").as("level"), col("src"), col("dst"), col("score"))
    (live.select(col("id"), col("vector"), col("level"), col("deleted")), edges)
  }

  /** Incremental index maintenance: fold a delta of upserts/tombstones into
    * an existing (nodes, edges) index WITHOUT rebuilding the untouched
    * graph — the batch analog of the reference's per-point insert/update
    * (`hnsw.ts:82-147`, `hnsw.ts:497-517`), which tombstones the old row,
    * re-inserts, and re-wires only the touched neighborhoods. The reference
    * leaves stale in-edges behind on update (SURVEY §7.5); this drops them.
    *
    * Dataflow, all proportional to |Δ| (the index-sized inputs are touched
    * by exactly one narrow scan each):
    *  1. latest-wins upsert of the node table ([[Mutations.upsert]]);
    *     delta levels come from [[levelOf]] — pure in id, so a merged
    *     node's level equals what a full rebuild would assign;
    *  2. candidates: live-node bucket membership (one scan) equi-joined
    *     with the BROADCAST delta membership on (layer, band-bucket) —
    *     no index-side shuffle;
    *  3. delta out-edges = top-M per (layer, delta id); reverse edges
    *     appended to the touched neighbors, whose adjacency alone is
    *     re-shrunk to M (`shrinkConnectionsIfNeeded`, `hnsw.ts:465-489`);
    *  4. edges touching a replaced/deleted id are dropped; everything else
    *     passes through untouched (an anti-join against the broadcast
    *     delta id set — a filter, not a shuffle).
    *
    * At 100 TB this is the difference between an O(index) rebuild per
    * ingest batch (the reference's full-snapshot-per-mutation cliff,
    * `astrovault.ts:34-40`) and O(|Δ| × bucket occupancy) work.
    * Hot-bucket note: a delta node scores against every member of its
    * buckets (no ring-chunking on the merge path) — merge cost is bounded
    * by |Δ| × hottest-bucket size; periodic full [[build]] (compaction)
    * restores the chunk-capped layout.
    *
    * `delta`: (id, vector[, deleted]). Returns the merged (nodes, edges). */
  def merge(nodes: DataFrame, edges: DataFrame, delta: DataFrame,
      params: IndexParams): (DataFrame, DataFrame) =
    mergeKeyed(nodes, edges, delta, params,
      v => bucketKeys(v, params), portableOrder = false)

  /** [[merge]] with data-derived anchor hyperplanes and plain-id capping
    * order — the incremental counterpart of [[buildAnchored]]: every
    * structural choice on the merge path (delta bucket membership, the
    * per-bucket efConstruction cap, neighbor ranks, the touched-set
    * re-shrink) is re-derivable by an external engine from the same
    * parquet, so the MERGED adjacency is DuckDB-oracle-checkable
    * end-to-end, not just invariant-checked. Production merges keep the
    * seeded-random default. */
  def mergeAnchored(nodes: DataFrame, edges: DataFrame, delta: DataFrame,
      params: IndexParams, anchors: Seq[Seq[Array[Float]]])
      : (DataFrame, DataFrame) =
    mergeKeyed(nodes, edges, delta, params,
      v => AnnSearch.anchorBucketKeys(v, anchors), portableOrder = true)

  /** The O(|Δ|) DELTA of a merge — what [[mergeKeyed]] composes into
    * full tables, exposed so an ingest path can PERSIST just the delta
    * (the [[graft.VectorStore]] graph delta chain) instead of rewriting
    * the whole generation:
    *  - `nodeDelta`: the delta's normalized node rows
    *    (id, vector, level, deleted) — latest-wins by id over the base;
    *  - `replacedSrcs`: every source whose ENTIRE adjacency this merge
    *    replaces (delta ids ∪ touched neighbors) — base/earlier edge
    *    rows of these sources must not serve;
    *  - `newEdges`: the replacement adjacency (level, src, dst, score)
    *    for exactly those sources.
    * Additionally every pre-existing edge POINTING AT a delta id is
    * stale (the node moved or died) — reconstruction drops base rows
    * with dst ∈ nodeDelta ids. [[mergeKeyed]] and the chain overlay
    * both build from these rules, so they cannot drift. */
  def mergeDelta(nodes: DataFrame, edges: DataFrame, delta: DataFrame,
      params: IndexParams, baseMembership: Option[DataFrame] = None)
      : (DataFrame, DataFrame, DataFrame) =
    mergeDeltaKeyed(nodes, edges, delta, params,
      v => bucketKeys(v, params), portableOrder = false, baseMembership)

  /** Narrow bucket membership (layer, b, id) of `nodes`' live rows under
    * the production seeded-random keys — a pure function of
    * (id, vector, level), which is what lets an ingest path PERSIST it as
    * its own delta-chained table ([[graft.VectorStore]]'s memb chain) and
    * hand it back to [[mergeDelta]] via `baseMembership`: the one
    * remaining corpus-wide term of a streamed batch (recomputing every
    * node's nBands × bucketBits hyperplane projections) becomes a narrow
    * no-vector parquet chain read + an O(|Δ|) append. `nodes` must carry
    * `level`. */
  def membershipNarrow(nodes: DataFrame, params: IndexParams): DataFrame = {
    val live =
      if (nodes.columns.contains("deleted")) nodes.filter(!col("deleted"))
      else nodes
    live
      .withColumn("layer", explode(sequence(lit(0), col("level"))))
      .withColumn("b", explode(bucketKeys(col("vector"), params)))
      .select(col("layer"), col("b"), col("id"))
  }

  private def mergeKeyed(nodes: DataFrame, edges: DataFrame, delta: DataFrame,
      params: IndexParams, keyFn: Column => Column, portableOrder: Boolean)
      : (DataFrame, DataFrame) = {
    val (deltaN, replacedSrcs, newEdges) =
      mergeDeltaKeyed(nodes, edges, delta, params, keyFn, portableOrder)
    val deltaIds = deltaN.select(col("id")).distinct()
    val mergedNodes = nodes
      .join(broadcast(deltaIds), Seq("id"), "left_anti")
      .unionByName(deltaN)
    val mergedEdges = edges
      .join(broadcast(replacedSrcs.select(col("id").as("src"))),
        Seq("src"), "left_anti")
      .join(broadcast(deltaIds.select(col("id").as("dst"))),
        Seq("dst"), "left_anti")
      .select(col("level"), col("src"), col("dst"), col("score"))
      .unionByName(newEdges
        .select(col("layer").as("level"), col("src"), col("dst"),
          col("score")))
    (mergedNodes, mergedEdges)
  }

  private def mergeDeltaKeyed(nodes: DataFrame, edges: DataFrame,
      delta: DataFrame, params: IndexParams, keyFn: Column => Column,
      portableOrder: Boolean,
      baseMembership: Option[DataFrame] = None)
      : (DataFrame, DataFrame, DataFrame) = {
    val scoreFn: (Column, Column) => Column = params.metric match {
      case "euclidean" => VectorFunctions.euclideanSim
      case _ => VectorFunctions.cosineSim
    }
    val deltaN = {
      val d = if (delta.columns.contains("deleted")) delta
              else delta.withColumn("deleted", lit(false))
      // dedup WITHIN the delta (latest occurrence by content-hash tiebreak,
      // mirroring Mutations.upsert's determinism rule) — small-side window
      val w = Window.partitionBy(col("id"))
        .orderBy(xxhash64(struct(col("vector"), col("deleted"))).desc)
      d.withColumn("level", levelOf(col("id"), params.levelMax))
        .select(col("id"), col("vector"), col("level"), col("deleted"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val deltaIds = deltaN.select(col("id")).distinct()
    // Latest-wins upsert specialized for the delta-always-wins case: a
    // broadcast anti-join passthrough of the index side instead of
    // Mutations.upsert's id-window over the whole table — the index never
    // shuffles (measured: the 3 window-sort recomputations of the wide
    // node table dominated merge wall time before this).
    val mergedNodes = nodes
      .join(broadcast(deltaIds), Seq("id"), "left_anti")
      .unionByName(deltaN)
    val live = mergedNodes.filter(!col("deleted"))

    def membership(df: DataFrame): DataFrame = df
      .withColumn("layer", explode(sequence(lit(0), col("level"))))
      .withColumn("b", explode(keyFn(col("vector"))))
      .select(col("layer"), col("b"), col("id"), col("vector"))

    // candidate pairs: live members of the delta nodes' buckets, with each
    // bucket's contribution CAPPED at efConstruction members (deterministic
    // hash-rank subset) — the batch analog of the reference's ef-bounded
    // insert beam (`hnsw.ts:112-140` scores ef=200 candidates per insert,
    // never a whole neighborhood). Without the cap a hot bucket makes the
    // merge O(|Δ| × bucket size); with it, scored volume is
    // ≤ |Δ| × layers × nBands × efConstruction (measured at 100k clustered
    // nodes: 40M → 0.8M scored pairs). The cap ranks NARROW rows
    // (layer, b, id) of the delta-touched buckets only; vectors re-attach
    // by id join afterwards. The delta side (small by contract) broadcasts,
    // so the index side never shuffles wide rows.
    val deltaM = membership(live.join(broadcast(deltaIds), Seq("id")))
      .select(col("layer"), col("b"), col("id").as("src"),
        col("vector").as("src_vec"))
    // merged-state membership: recomputed over the whole live table by
    // default, or — when the caller maintains the persisted memb chain
    // ([[membershipNarrow]]'s contract; keys MUST match `keyFn`) —
    // composed at O(|Δ|): pre-merge membership minus touched ids, plus
    // the delta's own rows (deltaM already holds exactly those).
    val liveNarrow = baseMembership match {
      case Some(m) =>
        m.select(col("layer"), col("b"), col("id"))
          .join(broadcast(deltaIds), Seq("id"), "left_anti")
          .unionByName(
            deltaM.select(col("layer"), col("b"), col("src").as("id")))
      case None =>
        membership(live).select(col("layer"), col("b"), col("id"))
    }
    val deltaBuckets = deltaM.select(col("layer"), col("b")).distinct()
    // cap rank order: hashed ids (uniform subsets) in production; plain id
    // order when an external oracle must re-derive the cap (buildKeyed's
    // portableOrder rule)
    val capOrder: Seq[Column] =
      if (portableOrder) Seq(col("id").asc)
      else Seq(xxhash64(col("id")).asc, col("id").asc)
    val bucketW = Window.partitionBy(col("layer"), col("b"))
      .orderBy(capOrder: _*)
    val cappedCand = liveNarrow
      .join(broadcast(deltaBuckets), Seq("layer", "b"))
      .withColumn("r", row_number().over(bucketW))
      .filter(col("r") <= params.efConstruction).drop("r")
      .join(live.select(col("id"), col("vector")), Seq("id"))
    val scored = cappedCand
      .select(col("layer"), col("b"), col("id").as("dst"),
        col("vector").as("dst_vec"))
      .join(broadcast(deltaM), Seq("layer", "b"))
      .filter(col("src") =!= col("dst"))
      .withColumn("score", scoreFn(col("src_vec"), col("dst_vec")))
      .groupBy(col("layer"), col("src"), col("dst"))
      .agg(max(col("score")).as("score"))
    val w = Window.partitionBy(col("layer"), col("src"))
      .orderBy(col("score").desc, col("dst").asc)
    // localCheckpoint: outE is |Δ|-sized but its lineage holds the one
    // corpus-wide membership scan — inE / touched / reWired / the
    // replaced-source set all branch off it, and left lazy each branch
    // re-executes that scan (the assemble() super-additive pattern)
    val outE = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= params.m).drop("rn")
      .localCheckpoint()
    val inE = outE.select(col("layer"), col("dst").as("src"),
      col("src").as("dst"), col("score"))
    val touched = outE.select(col("dst").as("id")).distinct()

    // stale edges out; the surviving old adjacency of TOUCHED neighbors
    // joins their re-shrink (untouched sources never enter the delta —
    // [[mergeKeyed]]/the chain overlay pass them through by anti-join)
    val aSrc = deltaIds.select(col("id").as("src"))
    val aDst = deltaIds.select(col("id").as("dst"))
    val cleanE = edges
      .join(broadcast(aSrc), Seq("src"), "left_anti")
      .join(broadcast(aDst), Seq("dst"), "left_anti")
      .select(col("level").as("layer"), col("src"), col("dst"), col("score"))
    val tSrc = touched.select(col("id").as("src"))
    val touchedOld = cleanE.join(broadcast(tSrc), Seq("src"), "left_semi")
    // one unified re-shrink for every rewired source (delta ids AND touched
    // neighbors — the sets can overlap when two delta nodes pick each
    // other): directed ∪ reversed ∪ surviving-old, dedup, top-M. Exactly
    // the full build's bidirectional-union-then-shrink on the small set.
    val reWired = outE.unionByName(inE).unionByName(touchedOld)
      .groupBy(col("layer"), col("src"), col("dst"))
      .agg(max(col("score")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= params.m).drop("rn")
    val replacedSrcs = deltaIds.unionByName(touched).distinct()
    (deltaN, replacedSrcs, reWired)
  }

  /** Persist nodes + edges as parquet plus a metadata sidecar (replaces the
    * single-JSON-blob snapshot, `hnsw.ts:781-810` / `astrovault.ts:34-40` —
    * self-describing, partitioned, and metric-preserving). */
  def save(nodes: DataFrame, edges: DataFrame, params: IndexParams,
      path: String): Unit = {
    // Materialize the (typically expensive) upstream build ONCE: each
    // write would otherwise recompute the full lineage, and
    // repartitionByRange adds a range-sampling pass that recomputes it
    // AGAIN — 4 recomputations for 2 writes (measured 4.3 s → 1 s on the
    // sf0.1 index).
    val n = nodes.persist()
    val e = edges.persist()
    try {
      // Range-cluster before writing: nodes sorted by id give parquet
      // min/max pruning for point lookups; edges range-partitioned on
      // (level, src) land level-aligned — small upper levels get one file
      // instead of one per write task, big levels split by volume (AQE
      // sizes the ranges). Cuts file count ~4× at small scale and keeps
      // file sizes balanced at large scale.
      n.repartitionByRange(col("id"))
        .write.mode("overwrite").parquet(s"$path/nodes")
      e.repartitionByRange(col("level"), col("src"))
        .write.mode("overwrite").partitionBy("level").parquet(s"$path/edges")
    } finally { n.unpersist(); e.unpersist(); () }
    val meta =
      s"""{"m":${params.m},"efConstruction":${params.efConstruction},
         |"metric":"${params.metric}","dim":${params.dim},
         |"levelMax":${params.levelMax},"bucketBits":${params.bucketBits},
         |"nBands":${params.nBands},"bucketChunk":${params.bucketChunk},
         |"seed":${params.seed}}""".stripMargin
      .replaceAll("\n", "")
    // sidecar goes through the data path's Hadoop FS, not driver-local nio
    graft.util.Fs.writeStringAtomic(nodes.sparkSession,
      s"$path/meta.json", meta)
  }

  /** Load a saved index; the metadata sidecar restores every parameter
    * (including metric — see metric-loss bug note on [[IndexParams]]). */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame, IndexParams) = {
    val raw = graft.util.Fs.readString(spark, s"$path/meta.json")
    def field(name: String): String = {
      val m = ("\"" + name + "\"\\s*:\\s*\"?([^,}\"]+)\"?").r
      m.findFirstMatchIn(raw).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"missing $name in $path/meta.json"))
    }
    val params = IndexParams(
      m = field("m").toInt,
      efConstruction = field("efConstruction").toInt,
      metric = field("metric"),
      dim = field("dim").toInt,
      levelMax = field("levelMax").toInt,
      bucketBits = field("bucketBits").toInt,
      nBands = field("nBands").toInt,
      bucketChunk = field("bucketChunk").toInt,
      seed = field("seed").toLong)
    (spark.read.parquet(s"$path/nodes"),
      spark.read.parquet(s"$path/edges"), params)
  }
}
