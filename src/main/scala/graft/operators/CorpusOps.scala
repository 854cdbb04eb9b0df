package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition controls a web-scale training pipeline applies after
  * cleaning/dedup and before mixing: per-source quotas (a handful of
  * domains dominate any crawl — C4/RefinedWeb-style caps stop them from
  * dominating the trained model too), source blocklists, and the
  * lang × source token-mixture table that training-mix decisions read.
  *
  * Scale notes: the cap is a per-source top-k — `row_number` + filter
  * compiles to WindowGroupLimit with a PARTIAL map-side pass, so every
  * task prunes to ≤ cap rows per source before the shuffle and a
  * billion-doc domain moves cap rows, not a billion. Rank order is a
  * salted md5 of the doc id (the [[Sampling]] portability rule):
  * deterministic on any engine at any parallelism, uncorrelated with id
  * order, and stable under corpus growth — adding docs never swaps
  * another source's survivors, the property that keeps trained-on sets
  * auditable. The mixture table aggregates to lang × source cardinality
  * (map-side combine) before the one tiny global-total window.
  */
object CorpusOps {

  /** Drop blocklisted sources, then keep at most `maxPerSource` docs per
    * source — survivors chosen by salted-hash rank (ties by id). Output =
    * input columns + `src_rank` (1-based rank of the kept doc within its
    * source). `blocklist` empty ⇒ quota only. */
  def sourceCap(docs: DataFrame, maxPerSource: Int,
      blocklist: Seq[String] = Nil, idCol: String = "doc_id",
      srcCol: String = "source", salt: String = "cap"): DataFrame = {
    require(maxPerSource > 0, s"maxPerSource $maxPerSource")
    val allowed =
      if (blocklist.isEmpty) docs
      // NULL-source rows are their own quota group, not blocklisted:
      // bare `!isin` evaluates NULL for them and the filter would
      // silently drop every unattributed doc the moment ANY blocklist
      // is set
      else docs.filter(col(srcCol).isNull || !col(srcCol).isin(blocklist: _*))
    val w = Window.partitionBy(col(srcCol))
      .orderBy(Sampling.hashKey(col(idCol), salt).asc, col(idCol).asc)
    allowed
      .withColumn("src_rank", row_number().over(w))
      .filter(col("src_rank") <= maxPerSource)
  }

  /** floor(n·1e6 / total) in overflow-safe BIGINT: the naive n·1e6 wraps
    * past ~9.2e12 tokens in one cell — ordinary at web scale — so split
    * the division (n = q·total + r):
    *   floor(n·1e6/total) = q·1e6 + q₂·1e3 + q₃
    * with q₂ = r·1e3 div total and q₃ = (r·1e3 mod total)·1e3 div total.
    * Every intermediate is < total·1e3, so the math is exact for corpus
    * totals up to ~9.2e15 tokens (≈ 370× a 100 TB corpus); n ≤ total
    * bounds the result at 1e6. Identical to the oracle's exact HUGEINT
    * `//` — the decomposition changes representation, not the value.
    * Takes column NAMES (`div` has no Column-API form); names are
    * backtick-quoted into the SQL so dots/spaces/keywords in a name
    * can't break parsing or resolve to the wrong column (embedded
    * backticks escape by doubling, per the SQL identifier rule). */
  def microShare(nCol: String, totalCol: String): Column = {
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    val n = q(nCol)
    val t = q(totalCol)
    expr(s"""($n div $t) * 1000000
      | + ((($n % $t) * 1000) div $t) * 1000
      | + (((($n % $t) * 1000) % $t) * 1000)
      |   div $t""".stripMargin.replaceAll("\n", " "))
  }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining layout:
    * documents concatenate in `idCol` order into one global token stream,
    * the stream chunks into fixed `seqTokens`-token training sequences,
    * and a document straddling a chunk boundary SPLITS across sequences
    * (no padding, no packing waste — the standard trade-off against
    * truncation/first-fit packing). Output is the fragment table that a
    * sequence writer consumes: one row per (sequence, document fragment)
    * with `seq_id`, `doc_id`, `start_tok` (fragment start within the
    * doc), `frag_tokens`, and `pos_in_seq` (fragment start within the
    * sequence) — every sequence except the last sums to exactly
    * `seqTokens`.
    *
    * Scale: the global prefix sum NEVER runs a corpus-sized unpartitioned
    * window. Stage 1 range-partitions the narrow (id, n_toks) projection
    * and cumsums WITHIN each partition (parallel); stage 2 cumsums the
    * per-partition totals — one window over ≤ `partitions` rows — and
    * broadcasts the offsets back. The result is the exact global running
    * sum under any partitioning (within-partition prefix + prior-partition
    * totals), so the output is partitioning-invariant and engine-exact
    * (all-BIGINT arithmetic).
    *
    * Token definition = split fields ([[mixtureStats]]'s rule: consistent
    * denominator, one pass); docs with NULL text drop (their token count
    * is NULL, excluded in both engines). */
  def packSequences(docs: DataFrame, seqTokens: Int,
      idCol: String = "doc_id", textCol: String = "text",
      partitions: Int = 0): DataFrame =
    packSequencesByCounts(
      docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_toks")),
      seqTokens, partitions)

  /** [[packSequences]] over a CALLER-SUPPLIED per-doc token-count table
    * (doc_id, n_toks) — the tokenizer-aware variant: a pretraining
    * sequence budget is measured in MODEL tokens, and whitespace fields
    * are only a proxy for them. Feed counts from a real tokenizer — the
    * persisted BPE vocabulary's segmentation
    * ([[TextFeaturizer.bpeSegment]] grouped per doc, the t33 harness
    * composition) — and the packed fragments line up with what the
    * training loader actually materializes. Same two-level prefix sum,
    * all-BIGINT arithmetic, partitioning-invariant output; docs with
    * non-positive counts drop (the NULL-text rule generalized). */
  def packSequencesByCounts(counts: DataFrame, seqTokens: Int,
      partitions: Int = 0): DataFrame = {
    require(seqTokens > 0, s"seqTokens $seqTokens")
    val b = seqTokens.toLong
    val toks = counts.select(col("doc_id"),
        col("n_toks").cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    val nPart =
      if (partitions > 0) partitions
      else counts.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = toks.repartitionByRange(nPart, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val local = ranged.withColumn("local_cum",
      sum(col("n_toks")).over(
        Window.partitionBy(col("pid")).orderBy(col("doc_id"))))
    val offsets = local.groupBy(col("pid"))
      .agg(sum(col("n_toks")).as("pid_total"))
      .withColumn("pid_offset",
        coalesce(sum(col("pid_total")).over(Window.orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("pid_offset"))
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("off", col("pid_offset") + col("local_cum") - col("n_toks"))
      .withColumn("seq_id", explode(sequence(
        expr(s"off div $b"), expr(s"(off + n_toks - 1) div $b"))))
      .withColumn("start_tok",
        greatest(lit(0L), col("seq_id") * lit(b) - col("off")))
      .withColumn("end_tok",
        least(col("n_toks"), (col("seq_id") + lit(1L)) * lit(b) - col("off")))
      .select(col("seq_id"), col("doc_id"), col("start_tok"),
        (col("end_tok") - col("start_tok")).as("frag_tokens"),
        (col("off") + col("start_tok") - col("seq_id") * lit(b))
          .as("pos_in_seq"))
  }

  /** Per-document sliding-window chunking — the RAG/embedding-side
    * complement to [[packSequences]] (which concatenates ACROSS docs for
    * pretraining): each document yields overlapping windows of
    * `window` tokens starting every `stride` tokens, the shape an
    * embedding/retrieval pipeline feeds its encoder. Chunk starts are
    * 0, stride, 2·stride, …; the count is 1 for docs within one window,
    * else ⌈(n−window)/stride⌉+1 (the last chunk may be short; every
    * token is covered, consecutive chunks overlap by window−stride).
    *
    * Output: (doc_id, chunk_id, start_tok, n_chunk_toks, chunk_text).
    * All-BIGINT start/count arithmetic; the chunk text itself is an
    * array_join of the token slice, so oracles can pin content (t24
    * hashes md5 of it). One narrow map-side explode — no shuffle, no
    * driver involvement, linear in corpus tokens at any scale. */
  def chunkByTokens(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window; got window=$window stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("n_chunks",
        when(col("n") <= window, lit(1L))
          .otherwise(expr(s"(n - $window + $stride - 1) div $stride") +
            lit(1L)))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_chunk_toks",
        least(lit(window.toLong), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_chunk_toks"),
        array_join(slice(col("toks"), (col("start_tok") + 1).cast("int"),
          col("n_chunk_toks").cast("int")), " ").as("chunk_text"))
  }

  /** Mixture drift between two corpus snapshots: the per-source terms of
    * KL(p‖q) where p = snapshot A's token mixture and q = snapshot B's —
    * the monitor a pipeline runs between crawl versions to catch a
    * source silently exploding or vanishing before the trained model
    * does. Output per source present in BOTH snapshots (KL is undefined
    * on disjoint support — absent sources surface through the count
    * columns of [[mixtureStats]] diffs, not here): token counts, exact
    * integer-micro shares ([[microShare]]), `lnr_micro` =
    * floor(ln(p/q)·1e6 + 0.5), and `contrib_micro2` = p_micro·lnr_micro
    * (micro² units; BIGINT-exact given the quantized factors — Σ/1e12 ≈
    * the KL in nats). The ratio evaluates as (n_a/T_a)/(n_b/T_b) —
    * correctly-rounded IEEE divisions in an identical tree on any
    * engine; the libm-ln 1-ulp exposure is per SOURCE (the t14 rule).
    *
    * Scale: each side aggregates ONCE to source cardinality (map-side
    * combinable); everything after runs on tiny per-source tables. */
  def mixtureDrift(a: DataFrame, b: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    def perSource(df: DataFrame, n: String, t: String): DataFrame =
      df.groupBy(col(srcCol))
        .agg(sum(size(split(col(textCol), " ")).cast("long")).as(n))
        // a source of only NULL texts aggregates to a NULL total — drop
        // it (no tokens, no mixture mass) rather than emit NULL ratios
        .filter(col(n).isNotNull)
        .withColumn(t, sum(col(n)).over(Window.partitionBy()))
    val pa = perSource(a, "n_tok_a", "t_a")
    val pb = perSource(b, "n_tok_b", "t_b")
    pa.join(pb, Seq(srcCol))
      .withColumn("lnr_micro", floor(log(
        (col("n_tok_a").cast("double") / col("t_a").cast("double")) /
          (col("n_tok_b").cast("double") / col("t_b").cast("double")))
        * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col(srcCol), col("n_tok_a"), col("n_tok_b"),
        microShare("n_tok_a", "t_a").as("p_micro"),
        microShare("n_tok_b", "t_b").as("q_micro"),
        col("lnr_micro"))
      .withColumn("contrib_micro2", col("p_micro") * col("lnr_micro"))
  }

  /** Rebalance the corpus to a target source mixture by deterministic
    * downsampling — the data-mixing step training pipelines run between
    * [[mixtureStats]] (measure) and training (consume): given relative
    * target weights per source, keep ALL of the most-underrepresented
    * source (relative to its target) and thin every other source so
    * expected token shares land on the target ratios. No upsampling —
    * one pass, maximum data retention under the target.
    *
    * Determinism/portability: per-source acceptance rates are EXACT
    * integer micros derived with BigInt on the driver (the per-source
    * totals table is tiny; numerators reach ~1e25 at 100 TB-corpus
    * magnitudes, past BIGINT but trivially inside BigInt/HUGEINT — the
    * oracle re-derives the same rates in HUGEINT SQL). The binding
    * source is the argmax of floor(target·10²⁴ / actual) with ties to
    * the lexicographically smallest source — a scaled-floor rule both
    * engines compute identically. A doc survives iff its salted-md5
    * micro-bucket ([[Sampling.hashKey]] mod 1e6) falls under its
    * source's rate: engine/partitioning-invariant and growth-stable
    * (adding docs never flips another doc's fate at fixed rates).
    *
    * Sources with no target weight (and NULL-source docs) drop; target
    * weights are RELATIVE (they need not sum to anything). Output =
    * surviving docs + `n_toks` ([[mixtureStats]]' split-fields rule) +
    * the source's `rate_micro` for auditability. */
  def resampleToMixture(docs: DataFrame, targets: Map[String, Long],
      idCol: String = "doc_id", srcCol: String = "source",
      textCol: String = "text", salt: String = "mix"): DataFrame = {
    require(targets.nonEmpty, "no target weights")
    require(targets.values.forall(_ > 0), s"non-positive target weight")
    val sp = docs.sparkSession
    import sp.implicits._
    val toks = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("n_toks"))
      // NULL-text docs carry no tokens: drop them here or a source of
      // only-null texts would surface as a NULL total (and an undecodable
      // rate denominator) instead of simply not participating
      .filter(col("n_toks").isNotNull)
    val actual = toks.filter(col("source").isin(targets.keys.toSeq: _*))
      .groupBy(col("source")).agg(sum(col("n_toks")).as("a"))
      .as[(String, Long)].collect().toMap
    require(actual.nonEmpty,
      s"no corpus docs under any targeted source ${targets.keys.toSeq.sorted}")
    val scale = BigInt(10).pow(24)
    // binding source m: the max of target/actual under the scaled-floor
    // rule; every rate is then r_s = floor(1e6·t_s·a_m / (a_s·t_m)) ≤ 1e6
    val m = actual.keys.minBy(s =>
      (-(BigInt(targets(s)) * scale / BigInt(actual(s))), s))
    val rates = actual.keys.toSeq.sorted.map { s =>
      val r = BigInt(1000000) * BigInt(targets(s)) * BigInt(actual(m)) /
        (BigInt(actual(s)) * BigInt(targets(m)))
      (s, r.toLong)
    }.toDF("source", "rate_micro")
    toks.join(broadcast(rates), Seq("source"))
      .filter(pmod(Sampling.hashKey(col("doc_id"), salt), lit(1000000L)) <
        col("rate_micro"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        col("rate_micro"))
  }

  /** Training-mixture table: per (lang, source) doc and whitespace-token
    * counts plus `share_micro` — the source's integer-micro share of all
    * corpus tokens ([[microShare]]: exact overflow-safe BIGINT floor
    * division, no float anywhere in a checked column). The
    * corpus aggregates ONCE (map-side combinable sums keyed by the tiny
    * lang × source space); the global total attaches via a window over the
    * aggregated rows — cardinality = distinct pairs, never corpus-sized.
    *
    * Token definition: `n_tokens` counts SPLIT FIELDS (`size(split(text,
    * " "))`), so consecutive spaces contribute empty fields — a cheaper
    * definition than the empties-filtered one [[TextDedup.tokens]]
    * consumers use, deliberate for a mixture table (shares need a
    * consistent denominator, not linguistic tokens; one pass, no filter).
    * The oracle mirrors the same definition, so parity holds; downstream
    * code must not assume this equals the dedup pipeline's token count. */
  def mixtureStats(docs: DataFrame, langCol: String = "lang",
      srcCol: String = "source", textCol: String = "text"): DataFrame = {
    val nToks = size(split(col(textCol), " ")).cast("long")
    docs
      .groupBy(col(langCol), col(srcCol))
      .agg(count(lit(1)).as("n_docs"), sum(nToks).as("n_tokens"))
      .withColumn("__total",
        sum(col("n_tokens")).over(Window.partitionBy()))
      .select(col(langCol), col(srcCol), col("n_docs"), col("n_tokens"),
        microShare("n_tokens", "__total").as("share_micro"))
  }

  /** Length-quantile batching buckets — the inference/training-serving
    * step that minimizes padding waste: docs batched with similar-length
    * docs pad to the batch max, not the corpus max. Bucket of a doc is
    * determined by its token count's position in the exact corpus length
    * distribution: bucket(len) = min(nBuckets−1, cumBefore(len)·nBuckets
    * div N) — all docs of one length share a bucket (same padding), and
    * buckets hold ~N/nBuckets docs each except where one hot length
    * overflows its quantile (unsplittable by definition).
    *
    * Scale: the distribution work is LENGTH-CARDINALITY-sized, never
    * corpus-sized — one hash-agg to (n_toks, cnt), a running sum over
    * those ≤ max-doc-length rows (tiny window), and a broadcast join
    * back on n_toks. No global sort, no corpus-wide window (the naive
    * ntile formulation is a one-partition window — unusable at scale).
    * All-BIGINT arithmetic → engine-exact. Output: input + (n_toks,
    * bucket). Docs with empty/NULL text drop (no tokens to batch). */
  def lengthBuckets(docs: DataFrame, nBuckets: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, s"nBuckets $nBuckets")
    val toks = docs
      .withColumn("n_toks", size(split(col(textCol), " ")).cast("long"))
      .filter(col("n_toks") > 0)
    val dist = toks.groupBy(col("n_toks")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum_before",
        coalesce(sum(col("cnt")).over(Window.orderBy(col("n_toks"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy()))
      .select(col("n_toks"),
        least(lit(nBuckets - 1).cast("long"),
          expr(s"(cum_before * $nBuckets) div total")).cast("int")
          .as("bucket"))
    toks.join(broadcast(dist), Seq("n_toks"))
  }

  /** Deterministic interleaved epoch ordering — the reproducible
    * corpus-shuffle a training run needs (engine row order is not a
    * contract; restarts and engine swaps must replay the SAME order):
    * per source, docs rank by a salted hash keyed on (epoch, doc id);
    * the global position interleaves sources round-robin,
    * `interleave_key = rank_in_source · nSources + source_index`, so
    * every prefix of the order carries near-equal doc counts per source
    * (±1 per stride) until a source exhausts — the anti-clumping
    * guarantee a plain hash order gives only in expectation. A new
    * `epoch` value re-deals the whole order.
    *
    * Scale: one per-source window (shuffle keyed by source; skew = the
    * largest source, salt-splittable like any hot key) + a broadcast
    * join against the ≤ |sources| index table. Consumers ORDER BY
    * interleave_key (TakeOrdered for prefixes, sorted write for full
    * epochs) — no global window anywhere. */
  def epochOrder(docs: DataFrame, epoch: Long,
      idCol: String = "doc_id", srcCol: String = "source",
      salt: String = "epoch"): DataFrame = {
    // NULL-source docs form their own stream (a null-safe key — a plain
    // equi-join on srcCol would silently drop them)
    val withKey = docs.withColumn("__src",
      coalesce(col(srcCol).cast("string"), lit("\u0000null")))
    val srcIdx = withKey.select(col("__src")).distinct()
      .withColumn("__src_idx",
        row_number().over(Window.orderBy(col("__src").asc)) - 1)
      .withColumn("__n_src", count(lit(1)).over(Window.partitionBy()))
    val ranked = withKey.withColumn("rank_in_source",
      row_number().over(Window.partitionBy(col("__src")).orderBy(
        Sampling.hashKey(concat(lit(epoch), lit("#"),
          col(idCol).cast("string")), salt).asc,
        col(idCol).asc)) - 1)
    ranked
      .join(broadcast(srcIdx), Seq("__src"))
      .withColumn("interleave_key",
        col("rank_in_source") * col("__n_src") + col("__src_idx"))
      .drop("__src", "__src_idx", "__n_src")
  }
}
