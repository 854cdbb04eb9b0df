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
      partitions: Int = 0): DataFrame = {
    require(seqTokens > 0, s"seqTokens $seqTokens")
    val b = seqTokens.toLong
    val toks = docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    val nPart =
      if (partitions > 0) partitions
      else docs.sparkSession.sessionState.conf.numShufflePartitions
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
}
