package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data dedup + text-analysis operators over a document
  * corpus (doc_id, text, …). All hashing is md5-based so results are
  * reproducible across engines and runs (no JVM-private hash seeds) — a
  * requirement for cross-engine verification and for idempotent re-runs of a
  * 100 TB pipeline.
  *
  * Scale design: every operator is groupBy/join on derived keys — shuffles
  * are on content hashes (uniform, no skew) and candidate generation is
  * blocked (LSH bands / source blocks) so nothing is all-pairs at corpus
  * scale.
  *
  * Rounding rule: decimal `round(col, 6)` — normally banned from
  * hash-checked columns (the Retrieval.scala portability note: JVM rounds
  * the shortest-decimal rendering, C engines round the binary value, and
  * they disagree at half-boundary values) — appears in this file ONLY on
  * RATIO columns whose values are rationals p/q with q bounded by a
  * document's token/element count (≲ 10⁴). Such a value is either exactly
  * a terminating decimal (both engines hold the identical double and
  * round it identically) or at least 1/(q·10⁷) ≈ 10⁻¹¹ from every 6-dp
  * half boundary — about 10⁵ ulps of clearance, so no achievable value
  * sits in the disagreement window. Irrational-valued scores (cosine,
  * BM25's ln, ADC distances) get no such guarantee and use the
  * floor-quantization rule (`floor(x·10ⁿ + 0.5)/10ⁿ`) instead.
  */
object TextDedup {

  /** Whitespace tokens of `text`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (the unit for Jaccard / MinHash). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Exact dedup: canonical content hash; keep one representative per hash
    * (min id), count members. The 100 TB-scale exact-dedup primitive: one
    * hash-partitioned groupBy, no content comparison after hashing. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** One MinHash signature component: min over the token set of a seeded md5.
    * Lexicographic min over hex strings is a valid uniform min-hash and is
    * engine-portable (no integer conversion needed). */
  def minhash(tokSet: Column, seed: Int): Column =
    array_min(transform(tokSet, t => md5(concat(lit(s"s$seed:"), t))))

  /** LSH band key: AND-combination of `nHashes` signature components —
    * collision probability j^nHashes for Jaccard j. */
  def minhashBand(tokSet: Column, nHashes: Int): Column =
    md5(concat_ws("|", (0 until nHashes).map(i => minhash(tokSet, i)): _*))

  /** Jaccard for every pair of rows sharing `blockCol`, via the scalable
    * explode→equi-join→count formulation: common-element counts come from a
    * hash join on (block, element) + aggregation, so cost is proportional to
    * SHARED content, not candidates × |set|², and everything stays inside
    * whole-stage codegen (no per-pair array scans). |A∪B| = |A|+|B|−|A∩B|.
    * Pairs with zero overlap never materialize — correct, since their
    * Jaccard is 0 and every useful `minJaccard` is positive. */
  private def blockedJaccardPairs(prepEx: DataFrame, minJaccard: Double): DataFrame = {
    // prepEx columns: id, blk, el — one row per (doc, distinct element)
    import org.apache.spark.sql.expressions.Window
    val ex = prepEx.withColumn("n",
      count(lit(1)).over(Window.partitionBy(col("id"))))
    val a = ex.select(col("blk"), col("el"), col("id").as("a_id"), col("n").as("a_n"))
    val b = ex.select(col("blk"), col("el"), col("id").as("b_id"), col("n").as("b_n"))
    a.join(b, Seq("blk", "el"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jacc",
        col("c").cast("double") / (col("a_n") + col("b_n") - col("c")))
      .filter(col("jacc") >= minJaccard)
      // round-6 is safe here: jacc = c/(a+b−c), a rational with
      // denominator ≤ |A∪B| — see the file-level rounding rule
      .select(col("a_id"), col("b_id"), round(col("jacc"), 6).as("jacc"))
  }

  /** MinHash-LSH near-dup pairs, as the hierarchical dedup pipeline a large
    * corpus needs: (1) collapse identical token sets by fingerprint (exact
    * dedup — one hash groupBy, removes the dominant duplicate mass before
    * anything quadratic); (2) LSH band-bucket the unique representatives;
    * (3) verify candidate pairs with exact Jaccard. Returns
    * (a_id, b_id, jacc), a_id < b_id, over representative ids (min doc id
    * per identical-set group).
    *
    * Step 3 is per-pair set intersection — quadratic in bucket size, kept in
    * check by the AND-band length (collision prob = j^nHashes) and by step 1
    * having removed all identical sets. */
  def minhashNearDupPairs(docs: DataFrame, nHashes: Int, minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val reps = docs
      .select(col(idCol).as("id"),
        sort_array(tokenSet(col(textCol))).as("set"))
      // identical-set collapse keyed on the md5 fingerprint (cheap shuffle
      // key; tokens can't contain the join delimiter so it's injective)
      .groupBy(md5(concat_ws(" ", col("set"))).as("fp"))
      .agg(min(col("id")).as("id"), first(col("set")).as("set"))
      .withColumn("band", minhashBand(col("set"), nHashes))
      // verify set ops run on int64 token codes — array_intersect over
      // longs, not strings (no per-element string hashing in the hot loop)
      .withColumn("codes", transform(col("set"), t => xxhash64(t)))
      .withColumn("n", size(col("set")))
      .select(col("band"), col("id"), col("codes"), col("n"))
      // compute-once for the self-join below; persist (lazy, recoverable
      // from lineage) rather than localCheckpoint (eager job at plan-build
      // time, non-recoverable executor-local blocks)
      .persist()
    val a = reps.select(col("band"), col("id").as("a_id"),
      col("codes").as("a_codes"), col("n").as("a_n"))
    val b = reps.select(col("band"), col("id").as("b_id"),
      col("codes").as("b_codes"), col("n").as("b_n"))
    a.join(b, Seq("band"))
      .filter(col("a_id") < col("b_id"))
      // size-compatibility bound: jacc ≤ min(n)/max(n), so pairs failing
      // min/max ≥ minJaccard can't qualify — pruned before any intersection
      .filter(least(col("a_n"), col("b_n")) >=
        greatest(col("a_n"), col("b_n")) * minJaccard)
      .withColumn("c", size(array_intersect(col("a_codes"), col("b_codes"))))
      .withColumn("jacc", col("c").cast("double") /
        (col("a_n") + col("b_n") - col("c")))
      .filter(col("jacc") >= minJaccard)
      // round-6 is safe here: jacc = c/(a+b−c), a rational with
      // denominator ≤ |A∪B| — see the file-level rounding rule
      .select(col("a_id"), col("b_id"), round(col("jacc"), 6).as("jacc"))
  }

  /** Deletion-neighborhood near-EXACT dup pairs — the linear-time
    * high-threshold alternative to MinHash-LSH: instead of probabilistic
    * banding, each document emits |set|+1 keys (the hash of its full sorted
    * token-hash list, plus one variant per single deletion). Two documents
    * share a key iff their token sets differ by at most one element each
    * (symmetric difference ≤ 2), which IMPLIES Jaccard ≥ (m−1)/(m+1) for
    * min set size m — so candidate generation is exact for that band, with
    * zero false-negative risk and no tuning, at O(Σ|set|) emitted keys.
    *
    * Pipeline mirrors [[minhashNearDupPairs]]: (1) collapse identical sets
    * to their min-id representative (removes the J=1 mass — without this,
    * a g-clone group costs C(g,2) pairs); (2) deletion-key equi-join for
    * candidates; (3) exact Jaccard verify. Returns (a_id, b_id, jacc),
    * a_id < b_id, over representatives.
    *
    * Scale: keys are uniform 60-bit integers (no skew) built
    * XOR-incrementally in O(|set|) per doc (see the inline comment for
    * the scheme). The candidate join is linear in true near-dup mass. */
  def deletionNeighborhoodPairs(docs: DataFrame, minJaccard: Double = 0.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Keys are XOR-incremental: the full-set key is bit_xor over the
    // 60-bit element hashes, and each deletion variant is full ⊕ element —
    // O(|set|) work per doc instead of re-hashing the remaining list per
    // deletion (O(|set|²·digest) — measured 3× slower at bench scale).
    // XOR set-hashing keeps the match semantics: B = A\{x}∪{y} ⟹
    // X_B ⊕ h(y) = X_A ⊕ h(x). Spurious XOR coincidences (~2⁻⁶⁰ per
    // candidate) would surface with their true (low) Jaccard.
    // 15-hex-digit md5 prefix → BIGINT is the engine-portable hash
    // (DuckDB: ('0x'||substr(md5(t),1,15))::BIGINT).
    val hashes = docs
      .select(col(idCol).as("id"), explode(tokenSet(col(textCol))).as("t"))
      .select(col("id"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("hv"))
    val perDoc = hashes.groupBy(col("id"))
      .agg(expr("bit_xor(hv)").as("fx"),
        sort_array(collect_list(col("hv"))).as("hvs"))
    val reps = perDoc
      .groupBy(md5(concat_ws("|",
        transform(col("hvs"), h => h.cast("string")))).as("fp"))
      .agg(min(col("id")).as("id"), first(col("fx")).as("fx"),
        first(col("hvs")).as("hvs"))
    val keys = reps.select(col("id"), explode(concat(
        array(col("fx")),
        transform(col("hvs"), h => col("fx").bitwiseXOR(h)))).as("k"))
    val cand = keys.select(col("k"), col("id").as("a_id"))
      .join(keys.select(col("k"), col("id").as("b_id")), Seq("k"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val sets = docs.select(col(idCol).as("id"),
      transform(tokenSet(col(textCol)), t => xxhash64(t)).as("codes"))
    cand
      .join(sets.select(col("id").as("a_id"), col("codes").as("a_codes"),
        size(col("codes")).as("a_n")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("codes").as("b_codes"),
        size(col("codes")).as("b_n")), Seq("b_id"))
      .withColumn("c", size(array_intersect(col("a_codes"), col("b_codes"))))
      .withColumn("jacc", col("c").cast("double") /
        (col("a_n") + col("b_n") - col("c")))
      .filter(col("jacc") >= minJaccard)
      // round-6 is safe here: jacc = c/(a+b−c), a rational with
      // denominator ≤ |A∪B| — see the file-level rounding rule
      .select(col("a_id"), col("b_id"), round(col("jacc"), 6).as("jacc"))
  }

  /** Connected components over an undirected pair graph (e.g. the near-dup
    * pairs from [[minhashNearDupPairs]]): each node gets `cluster_id` = the
    * minimum node id reachable from it. This is the transitive-closure step
    * corpus dedup needs AFTER candidate pairs — near-dup is not transitive,
    * so keeping "one doc per pair" both over- and under-deletes; the unit of
    * retention is the component (keep its min-id representative).
    *
    * Algorithm: iterative min-label propagation — label(v) ← min(label(v),
    * min over neighbors' labels) until fixpoint, detected by the (strictly
    * decreasing) label sum. Near-dup components are dense and tiny, so the
    * iteration count is the component diameter (1–3 in practice); each
    * round is one shuffle on node id, and `localCheckpoint` cuts lineage so
    * plan size stays O(1) across rounds.
    *
    * `pathHalving` adds a label-of-label join per round (pointer doubling),
    * turning O(diameter) rounds into O(log diameter) — enable it for
    * adversarial chain-shaped graphs. It is OFF by default because the
    * extra join is pure overhead on the shallow components near-dup
    * produces: measured 5.5 s → 10.5 s on the sf0.1 gate fixture
    * (SCALING.md). The fixpoint (component min) is identical either way.
    * Halving also AUTO-ENABLES after `autoHalveAfter` non-converged rounds:
    * a graph still moving labels past that point is chain-shaped (shallow
    * components converge in 1–3), and O(diameter) plain rounds would blow
    * the iteration budget that pointer doubling meets in O(log diameter) —
    * so adversarial inputs degrade to the halving cost instead of silently
    * truncating at `maxIters`.
    *
    * Returns (node, cluster_id) for every node in the pair graph. */
  def connectedComponents(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIters: Int = 25,
      pathHalving: Boolean = false, autoHalveAfter: Int = 5): DataFrame = {
    val sym = pairs.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
      .union(pairs.select(col(bCol).cast("long").as("s"), col(aCol).cast("long").as("d")))
      .distinct()
      .persist()
    // sum over an empty frame is null — an empty pair set (clean corpus) is
    // a legitimate input and must yield an empty result, not an NPE
    def labelSum(lab: DataFrame): Long =
      Option(lab.agg(sum(col("cluster_id"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    // init: min of self and direct neighbors (one propagation round folded in)
    var cur = sym.groupBy(col("s").as("node"))
      .agg(min(col("d")).as("m"))
      .select(col("node"), least(col("node"), col("m")).as("cluster_id"))
      .localCheckpoint()
    var curSum = labelSum(cur)
    var it = 0
    var done = false
    var halve = pathHalving
    while (!done && it < maxIters) {
      if (!halve && it >= autoHalveAfter) {
        halve = true
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"connectedComponents still moving after $it rounds — " +
            "chain-shaped graph; enabling path halving")
      }
      val nbrMin = sym
        .join(cur.select(col("node").as("d"), col("cluster_id").as("nl")), Seq("d"))
        .groupBy(col("s").as("node"))
        .agg(min(col("nl")).as("nbr_min"))
      val prop = cur.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      val halved =
        if (!halve) prop
        else prop.join(
            prop.select(col("node").as("cluster_id"),
              col("cluster_id").as("ll")),
            Seq("cluster_id"), "left")
          .select(col("node"),
            least(col("cluster_id"), coalesce(col("ll"), col("cluster_id")))
              .as("cluster_id"))
      val next = halved.localCheckpoint()
      val nextSum = labelSum(next)
      done = nextSum == curSum // labels only decrease ⇒ equal sum = fixpoint
      cur = next
      curSum = nextSum
      it += 1
    }
    sym.unpersist()
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did not converge within $maxIters rounds; " +
          "cluster_ids may be partial (long chains need more iterations)")
    cur
  }

  /** The ACTION step after [[connectedComponents]]: turn component labels
    * into a per-document keep/drop decision over the WHOLE corpus. Every
    * doc gets (cluster_id, cluster_size, keep): docs in no near-dup pair
    * are singleton clusters of themselves; in each cluster exactly the
    * min-id member is kept (the deterministic representative rule —
    * reproducible across runs/engines, no "first seen" order dependence).
    *
    * Scale: the label table is pair-graph-sized (only docs that matched
    * SOME near-dup candidate), orders of magnitude smaller than the
    * corpus; cluster sizes aggregate over labels alone, and the corpus is
    * touched by exactly one left join against that small table (AQE
    * broadcasts it when it fits). The corpus never shuffles. */
  def dedupSelect(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id",
      precomputedLabels: Option[DataFrame] = None): DataFrame = {
    // `precomputedLabels` (node, cluster_id): a persisted
    // [[connectedComponents]] run over the SAME pair table — the
    // pair-labeling is one batch job whose output every consumer
    // (component reporting, keep/drop selection, audits) reloads, so a
    // caller that already materialized it must not pay the iterative
    // propagation twice
    val labels = precomputedLabels.getOrElse(connectedComponents(pairs))
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("__sz"))
    val labeled = labels.join(sizes, Seq("cluster_id"))
      .select(col("node").as(idCol), col("cluster_id"), col("__sz"))
    docs.select(col(idCol))
      .join(labeled, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"),
        coalesce(col("__sz"), lit(1L)).as("cluster_size"),
        (col(idCol) === coalesce(col("cluster_id"), col(idCol))).as("keep"))
  }

  /** Train/test contamination check: for every corpus document, the count
    * of distinct word n-grams (and distinct test documents) it shares with
    * the held-out benchmark set `testDocs`. Exact n-gram overlap is the
    * standard decontamination test (GPT-3/Pile style).
    *
    * Scale: the corpus side is exploded once to (id, ngram-hash) and joined
    * against the test-set n-grams, which BROADCAST only while their size
    * estimate fits `broadcastBytes` (the [[KnnSearch.knnExact]] gate) — a
    * benchmark suite is normally a small FIXED input, so the corpus never
    * shuffles; a large held-out set falls past the gate and the join runs
    * unhinted (AQE picks the strategy), instead of pinning an oversized
    * gram table in every executor. The only wide op is the per-doc
    * aggregation of matches.
    *
    * The join key is the n-gram STRING itself — exact equality, zero
    * collision caveat. The earlier 60-bit md5 keying bought only a
    * smaller broadcast of the side that is small by construction, at
    * the cost of hashing every corpus gram (measured neutral at the
    * bench SF; the honest win of dropping it is semantic — no
    * collision footnote on a correctness operator). */
  def contamination(docs: DataFrame, testDocs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastBytes: Long = 64L << 20): DataFrame = {
    def grams(df: DataFrame, idAs: String): DataFrame = df
      .select(col(idCol).as(idAs), explode(shingles(col(textCol), n)).as("sh"))
    // corpus grams are NOT pre-deduped: that would shuffle every gram in
    // the corpus, while the final countDistinct dedups anyway — only the
    // (small) matched rows ever reach a shuffle. The broadcast test side
    // IS deduped (shrinks the broadcast, nothing else does it).
    val testGrams = grams(testDocs, "test_id").distinct()
    grams(docs, "id")
      .join(KnnSearch.maybeBroadcast(testGrams, broadcastBytes), Seq("sh"))
      .groupBy(col("id"))
      .agg(countDistinct(col("sh")).as("n_shared_ngrams"),
        countDistinct(col("test_id")).as("n_test_docs"))
  }

  /** Repetition signals (Gopher-style quality gates): per document, the
    * fraction of word-bigram occurrences taken by the single most frequent
    * bigram, and the fraction lying in any repeated (count > 1) bigram.
    * High values flag boilerplate / generated spam. One posexplode + two
    * hash aggregations — map-side combinable, shuffle key is doc id. */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      // split on repeated/leading spaces yields "" tokens; drop them so
      // multi-space text doesn't produce phantom bigrams (same guard as
      // featureHashSparse / tfidfTopTerms)
      .filter(length(col("tok")) > 0)
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val grams = toks
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("id"), concat_ws(" ", col("tok"), col("nxt")).as("g"))
    grams.groupBy(col("id"), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        max(col("cnt")).as("top_cnt"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_mass"))
      // round-6 is safe here: both fracs are count/count rationals with
      // denominator ≤ n_bigrams — see the file-level rounding rule
      .select(col("id"), col("n_bigrams"),
        round(col("top_cnt").cast("double") / col("n_bigrams"), 6).as("top_bigram_frac"),
        round(col("dup_mass").cast("double") / col("n_bigrams"), 6).as("dup_bigram_frac"))
  }

  /** Cross-document duplicated-span signal — the batch form of span-level
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"; C4's repeated-span removal): per document, how many
    * of its word n-gram POSITIONS carry a span that also occurs in at
    * least one OTHER document. Positional (a span repeated in-doc counts
    * each occurrence) and cross-doc only — within-doc repetition is
    * [[repetitionSignals]]' job. High fractions mark boilerplate shared
    * across pages.
    *
    * Scale: positional spans come from [[positionalSpans]] (posexplode +
    * `lead`, O(L) — never HOF-over-array retokenization); they shuffle
    * ONCE on their uniform full-md5 key into per-(span, doc) counts; the
    * corpus-wide distinct-doc count is a window over those already-deduped
    * rows; the final per-doc rollup shuffles only doc ids. Nothing is
    * pairwise, no span list ever sits in one row. */
  /** Positional word n-gram spans: one (id, i, k) row per 0-based span
    * start over the FILTERED tokens (multi-space gaps don't shift
    * positions), k = FULL md5 of the space-joined span. The full 128-bit
    * digest, not a truncated prefix: [[spanScrub]] MUTATES text on key
    * equality, where a prefix collision is silent data corruption of an
    * unrelated document (and an engine-parity break — the oracle groups
    * raw strings), not just a miscount. Shared by [[duplicatedSpans]] and
    * [[spanScrub]] so the two can never disagree about what a span is.
    * Built with posexplode + `lead` (O(L), the d04/t07 shape — never
    * HOF-over-array retokenization). */
  private def positionalSpans(docs: DataFrame, n: Int, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks0 = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val toks = toks0.withColumn("i", row_number().over(w) - 1)
    val wi = Window.partitionBy(col("id")).orderBy(col("i"))
    val leads = (1 until n).map(j => lead(col("tok"), j).over(wi).as(s"t$j"))
    toks.select((col("id") +: col("i") +: col("tok").as("t0") +: leads): _*)
      // lead(n-1) null ⇔ the span runs off the document end (indices are
      // consecutive, so the last lead being present implies all are)
      .filter(col(s"t${n - 1}").isNotNull)
      .select(col("id"), col("i"),
        md5(concat_ws(" ", (0 until n).map(j => col(s"t$j")): _*)).as("k"))
  }

  def duplicatedSpans(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = positionalSpans(docs, n, idCol, textCol).drop("i")
    val perDoc = spans.groupBy(col("k"), col("id")).agg(count(lit(1)).as("c"))
    val nd = Window.partitionBy(col("k"))
    perDoc.withColumn("n_docs", count(lit(1)).over(nd))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_spans"),
        sum(when(col("n_docs") > 1, col("c")).otherwise(0L)).as("n_dup_spans"))
  }

  /** The ACTION step after [[duplicatedSpans]] — Lee et al.-style span
    * scrubbing: drop every token covered by a word n-gram span that also
    * occurs in ANOTHER document, and reassemble the surviving tokens (in
    * order, single-space joined) into the cleaned text. This is the
    * conservative all-copies policy — every occurrence of a cross-doc
    * duplicated span goes, which needs no global document order (the
    * keep-first-occurrence variant requires one, and any such order is
    * arbitrary in a distributed corpus).
    *
    * Output per input doc: (idCol, n_kept, n_dropped, clean_hash) with
    * clean_hash = md5 of the reassembled text (docs losing everything —
    * or empty to begin with — hash the empty string).
    *
    * Scale: span keys are FULL md5 digests ([[positionalSpans]] — a
    * truncated key here would let a hash collision scrub unrelated text)
    * grouped map-side (uniform shuffle keys); the duplicated-key set is
    * far smaller than the span
    * table and joins back on the key; coverage positions stay narrow
    * (id, index) rows; reassembly is one groupBy(doc) whose collected
    * list is bounded by document length — the same per-doc bound every
    * tokenize pass already carries. No driver-side loops, no cross-doc
    * ordering dependence anywhere. */
  def spanScrub(docs: DataFrame, n: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks0 = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    // re-index over the FILTERED tokens (0-based) so multi-space gaps in
    // the raw split positions don't shift span coverage
    val toks = toks0.withColumn("i", row_number().over(w) - 1)
      .select(col("id"), col("i"), col("tok"))
    val spans = positionalSpans(docs, n, idCol, textCol)
    val dupKeys = spans.groupBy(col("k"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") > 1).select(col("k"))
    val covered = spans.join(dupKeys, Seq("k"))
      .select(col("id"),
        explode(sequence(col("i"), col("i") + lit(n - 1))).as("i"))
      .distinct()
    val kept = toks.join(covered, Seq("id", "i"), "left_anti")
    val agg = kept.groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          e => e.getField("tok")), " ")).as("clean_hash"))
    val tot = toks.groupBy(col("id")).agg(count(lit(1)).as("n_tok"))
    docs.select(col(idCol).as("id"))
      .join(tot, Seq("id"), "left")
      .join(agg, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_tok"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_dropped"),
        coalesce(col("clean_hash"), md5(lit(""))).as("clean_hash"))
  }

  /** Word n-gram shingle set (n consecutive tokens joined by one space).
    * Docs shorter than n tokens yield an empty set.
    *
    * Built from n row-level `slice`s of the token array folded with
    * `zip_with` — every lambda references only its own variables. The
    * obvious `transform(sequence(...), i => element_at(t, i+j))`
    * formulation embeds the split's whole expression TREE in the lambda
    * body (a reused Column val is tree duplication, not a shared
    * binding), and a lambda body evaluates once per element — the split
    * re-ran once per position, O(L²) per document (measured: t06
    * 5.15 s → 0.83 s at sf0.1 from this rewrite alone). Outer trees a
    * HOF needs must arrive as HOF *arguments* (evaluated per row), as
    * attributes, or via posexplode (the ngramJaccardPairs shape). */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    val nShingles = size(t) - (n - 1)
    val joined = (0 until n).map(k => slice(t, lit(k + 1), nShingles))
      .reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(array_distinct(joined))
  }

  /** Exact n-gram Jaccard near-dup pairs within a blocking key (e.g. same
    * source) — the blocked-comparison baseline the LSH path approximates. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
      blockCol: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // Shingles via posexplode + window lead, NOT transform() over the token
    // array: a HOF lambda that references the split() tree re-evaluates it
    // per element (Catalyst inlines through lambda bodies), turning an O(L)
    // tokenization into O(L²) per doc. The exploded form splits once.
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val leads = col("tok") +: (1 until n).map(j => lead(col("tok"), j).over(w))
    val ex = toks
      .withColumn("last_tok", lead(col("tok"), n - 1).over(w))
      .withColumn("el", concat_ws(" ", leads: _*))
      .filter(col("last_tok").isNotNull)
      .select(col("id"), col("blk"), col("el")).distinct()
    blockedJaccardPairs(ex, minJaccard)
  }

  /** EXACT token-set Jaccard self-join via PREFIX FILTERING (the public
    * PPJoin family — Xiao et al. 2008, "Efficient Similarity Joins for
    * Near Duplicate Detection"): unlike MinHash-LSH (d03 — probabilistic
    * recall) or block-restricted n-gram Jaccard (d04 — exact only
    * within a block), this finds EVERY pair with token-set Jaccard ≥ τ
    * across the whole corpus, with two lossless prunes doing the work
    * an all-pairs join can't afford:
    *
    *  - PREFIX filter: order each doc's distinct tokens globally by
    *    (ascending corpus frequency, token); two sets with Jaccard ≥ τ
    *    MUST share a token among each one's first
    *    `|x| − ⌈τ·|x|⌉ + 1` tokens — so candidates come from an
    *    equi-join on PREFIX tokens only, and because prefixes hold the
    *    RAREST tokens, hot-token join keys are structurally excluded.
    *  - LENGTH filter: Jaccard ≥ τ forces τ·max(|x|,|y|) ≤ min(|x|,|y|)
    *    — applied inside the candidate join.
    *
    * Verification is exact integer arithmetic end-to-end: τ enters as
    * `tauMicro` (parts per million), intersections count shared tokens,
    * and the accept test is `inter · 1e6 ≥ tauMicro · union` — no float
    * threshold for an oracle to disagree on. Output
    * (a_id, b_id, inter, n_union) — all BIGINT.
    *
    * Scale: one tokenize pass; the frequency table is vocab-sized; the
    * per-doc rank window partitions by doc (bounded groups); candidate
    * volume is Σ prefix-token collisions (rare tokens ⇒ small buckets);
    * the verify join touches candidate pairs' tokens only.
    *
    * `tokenFn` picks the set elements: the default distinct-unigram set,
    * or [[shingles]] for n-gram-set Jaccard — prefix filtering thrives
    * on RARE elements, so on corpora with a small shared vocabulary
    * (where every unigram is hot) shingle sets restore the pruning
    * power AND measure the more meaningful near-dup signal. */
  def prefixJaccardPairs(docs: DataFrame, tauMicro: Long,
      idCol: String = "doc_id", textCol: String = "text",
      tokenFn: Column => Column = tokenSet): DataFrame = {
    require(tauMicro > 0 && tauMicro <= 1000000L, s"tauMicro $tauMicro")
    import org.apache.spark.sql.expressions.Window
    // exactness depends on SET semantics: sizes and the verify-join
    // intersection are counts over these rows, so a non-distinct tokenFn
    // would silently turn them into multiset counts and corrupt every
    // accept/reject. array_distinct here makes the contract hold for ANY
    // caller-supplied tokenizer (a no-op for the built-in set-valued ones).
    val toks = docs
      .select(col(idCol).as("id"),
        explode(array_distinct(tokenFn(col(textCol)))).as("tok"))
      .filter(length(col("tok")) > 0)
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("tok").asc)
    val ranked = toks.join(freq, Seq("tok"))
      .withColumn("pos", row_number().over(w))
      .join(sizes, Seq("id"))
    // prefix length = n − ceil(τ·n) + 1, integer-exact ceil
    val prefix = ranked.filter(col("pos") <=
      col("n") - expr(s"(n * $tauMicro + 999999) div 1000000") + 1)
    val cand = prefix.select(col("tok"), col("id").as("a_id"),
        col("n").as("n_a"))
      .join(prefix.select(col("tok"), col("id").as("b_id"),
        col("n").as("n_b")), Seq("tok"))
      .filter(col("a_id") < col("b_id") &&
        col("n_a") * tauMicro <= col("n_b") * 1000000L &&
        col("n_b") * tauMicro <= col("n_a") * 1000000L)
      .select(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
      .distinct()
    cand
      .join(toks.select(col("id").as("a_id"), col("tok")), Seq("a_id"))
      .join(toks.select(col("id").as("b_id"), col("tok")),
        Seq("b_id", "tok"))
      .groupBy(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("n_union", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * 1000000L >= col("n_union") * tauMicro)
      .select(col("a_id"), col("b_id"), col("inter"), col("n_union"))
  }

  /** 16-bit SimHash signatures over the distinct token set: bit i is the
    * sign of the vote sum where each token votes +1/−1 by the top bit of hex
    * digit i of its md5. Signature is a 16-char '0'/'1' string (portable; no
    * integer bit-ops needed).
    *
    * One explode + hash-aggregate pass: each token's md5 is computed once
    * and feeds all 16 bit counters as conditional sums — vs. the naive
    * 16-HOF-pass formulation this is ~10× less hashing and stays in
    * whole-stage codegen. */
  def simhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val ex = docs
      .select(col(idCol).as("id"), explode(tokenSet(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until 16).map { i =>
      sum(when(substring(col("h"), i + 1, 1) >= "8", 1).otherwise(-1))
        .as(s"v$i")
    }
    val bits = (0 until 16).map(i =>
      when(col(s"v$i") >= 0, "1").otherwise("0"))
    ex.groupBy(col("id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), concat(bits: _*).as("simhash"))
  }

  /** Document fingerprint: md5 over the sorted distinct token set — a
    * canonical content signature robust to token order (the rolling-hash
    * fingerprint analog, engine-portable). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokenSet(text))))

  /** Stopword list used by quality scoring / language id. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Quality features + composite score — length, lexical diversity,
    * stopword ratio (the standard cheap quality gates for corpus filtering).
    * All ratios are double divisions of exact integers → bit-deterministic. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val ts = array_distinct(t)
    val stop = filter(t, x => x.isin(stopwords: _*))
    docs
      .withColumn("n_tokens", size(t))
      .withColumn("n_uniq", size(ts))
      .withColumn("stopword_ratio",
        size(stop).cast("double") / col("n_tokens"))
      .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_tokens"))
      // round-6 is safe here: quality = (u + n − s)/(2n), a rational with
      // denominator ≤ 2·n_tokens — see the file-level rounding rule
      .withColumn("quality",
        round(lit(0.5) * col("uniq_ratio")
          + lit(0.5) * (lit(1.0) - col("stopword_ratio")), 6))
  }

  /** Heuristic language id: stopword-marker frequency per language, highest
    * ratio wins ('unknown' below `minRatio`). Deterministic rule set — the
    * n-gram-frequency langid family reduced to its portable core. */
  def langId(text: Column, minRatio: Double = 0.02): Column = {
    val t = tokens(text)
    val ratio = size(filter(t, x => x.isin(stopwords: _*))).cast("double") / size(t)
    when(ratio >= minRatio, lit("en")).otherwise(lit("unknown"))
  }

  /** Token counting: whitespace tokens plus a regex token count
    * ([a-z]+ runs — the BPE-ish lower-bound measure). */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_ws_tokens", size(tokens(col(textCol))))
      .withColumn("n_alpha_tokens", regexp_count(col(textCol), lit("[a-z]+")))

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023,
    * arXiv:2303.09540) over an embedding column — the dedup axis the
    * text-shingle family cannot see: paraphrases, translations and
    * re-encodings that share no surface n-grams but embed to nearly the
    * same direction. Assign every vector to its nearest centroid (the
    * [[IvfIndex.assign]] broadcast argmax — cosine, ties to the lower
    * cell), then within each cluster drop every vector whose cosine
    * similarity to a LOWER-id cluster-mate exceeds `tau`
    * (keep-lowest-id — the deterministic, engine-portable stand-in for
    * the paper's keep-one-per-ε-group; the kept set is identical for
    * transitively-linked groups whose members share a cluster).
    *
    * Output: (id, cell, keep) — keep=false marks a semantic duplicate
    * of some lower-id same-cluster vector.
    *
    * Scale (the paper's own argument): clustering exists precisely so
    * the pair scan is per-cell, O(Σ|cell|²) instead of O(n²) — k grows
    * with the corpus to hold |cell| ~constant; assignment is one
    * broadcast map-side pass (centroids ≤ k rows), the pair self-join
    * shuffles on cell, and the final keep flag is a left-join against
    * the (small) duplicate-id set.
    *
    * HOT-CELL SALTING: the per-cell pair count O(|cell|²) is the
    * algorithm (every within-cell pair must be examined), but without
    * salting ONE task would own a hot cell's entire quadratic block — a
    * single skewed cluster (adversarial or just a dense topic) turns
    * into a straggler regardless of executor count. Cells above
    * `maxCellSide` members therefore split into g = ⌈|cell|/maxCellSide⌉
    * id-hash salt groups and the self-join decomposes into the full
    * (sa, sb) grid — each side replicated g× with the OTHER side's salt
    * as part of the key, so every pair is matched exactly once (at
    * (sa(a), sb(b))) and the largest join group is bounded by
    * maxCellSide² pairs independent of cell size. Unsalted cells
    * (g = 1) degenerate to the plain equi-join. The pair SET — and
    * therefore the output — is identical at any `maxCellSide`
    * (TextDedupSpec pins this; d14 hash-checks the default). */
  def semanticDedup(vectors: DataFrame, centroids: DataFrame, tau: Double,
      idCol: String = "id", vecCol: String = "vector",
      maxCellSide: Int = 65536,
      assignments: Option[DataFrame] = None): DataFrame = {
    require(maxCellSide >= 1, s"maxCellSide $maxCellSide")
    // `assignments` (id, cell — the [[IvfIndex.search]] pattern): a
    // persisted build-time assignment skips the O(n × k) argmax
    // entirely — the scale lever past ~1 M vectors, where assignment
    // (not the per-cell pair scan) dominates at the k-grows-with-n
    // contract. Past k ≈ 256 compute the passed-in assignment with
    // [[IvfIndex.assignHierarchical]] (~2n√k vs the flat n×k n^1.5
    // term — 310.4 → 22.7 s at 6 M × 2449, SCALING.md 6 M rung);
    // blocking semantics are what this operator consumes, and the
    // two-level path preserves them. Without one, the in-line
    // assignment is checkpointed:
    // it feeds FOUR consumers (size/salt table, both pair self-join
    // sides, keep attach) and Catalyst would re-execute the argmax per
    // consumer (measured 4× the stage cost inside assemble()).
    val assigned = (assignments match {
      case Some(a) =>
        vectors.select(col(idCol).as("id"), col(vecCol).as("vector"))
          .join(a.select(col("id"), col("cell")), Seq("id"))
      case None => IvfIndex.assign(
        vectors.select(col(idCol).as("id"), col(vecCol).as("vector")),
        centroids)
    }).localCheckpoint()
    // per-cell salt factor g (the sizes table is ≤ k rows — broadcast)
    val sizes = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("__sz"))
      .select(col("cell"),
        ceil(col("__sz").cast("double") / maxCellSide).cast("int")
          .as("__g"))
    val x = assigned.select(col("cell"), col("id"), col("vector"))
      .join(broadcast(sizes), Seq("cell"))
      .withColumn("__s", pmod(xxhash64(col("id")), col("__g")).cast("int"))
    // A carries (own salt, every B salt); B carries (every A salt, own
    // salt): the (cell, sa, sb) key matches each pair exactly once and
    // caps the group at maxCellSide² pairs
    val a = x.select(col("cell"), col("__s").as("__sa"),
        explode(sequence(lit(0), col("__g") - 1)).as("__sb"),
        col("id").as("a_id"), col("vector").as("a_vec"))
    val b = x.select(col("cell"),
        explode(sequence(lit(0), col("__g") - 1)).as("__sa"),
        col("__s").as("__sb"),
        col("id").as("b_id"), col("vector").as("b_vec"))
    val dup = a.join(b, Seq("cell", "__sa", "__sb"))
      .filter(col("a_id") > col("b_id"))
      .filter(graft.functions.VectorFunctions.cosineSim(
        col("a_vec"), col("b_vec")) > tau)
      .select(col("a_id").as("id")).distinct()
    assigned.select(col("id"), col("cell"))
      .join(dup.withColumn("__dup", lit(true)), Seq("id"), "left")
      .withColumn("keep", col("__dup").isNull)
      .drop("__dup")
  }
}
