package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Batch embedding generation — the "embed text, store id+vector" workflow
  * the reference is built around (`README.md:99-109`, which embeds with a
  * MiniLM model client-side). A neural encoder isn't available in this
  * environment, so the embedder is FEATURE HASHING (the classic hashing
  * trick): tokens hash into `dim` buckets, counts form the vector, L2
  * normalized — a real, deterministic, unsupervised text vectorizer whose
  * pipeline shape (explode → bucket → groupBy → densify → normalize) is
  * exactly what a model-server batch encoder slots into.
  *
  * Scale: one explode + one groupBy(doc, bucket) + one groupBy(doc) —
  * map-side combinable, shuffle keys uniform by construction (md5 buckets).
  */
object TextFeaturizer {

  /** GPT-2-style pre-tokenization pattern (the segmentation a byte-pair
    * tokenizer merges WITHIN — public openai/gpt-2 `encoder.py`), reduced
    * to the Java∩RE2-identical subset: the original's `\s+(?!\S)`
    * lookahead is dropped (RE2 has no lookaround) with its effect folded
    * into the trailing space-run alternative, and `\p{L}`/`\p{N}` narrow
    * to ASCII classes. Alternatives in order: contraction suffixes,
    * optionally space-prefixed letter runs / digit runs / symbol runs,
    * residual space runs — every character lands in exactly one piece,
    * and both engines scan leftmost-first over the same alternation, so
    * the segmentation is engine-portable. Piece counts over this track
    * BPE token budgets far more closely than whitespace fields
    * (contractions split, digit runs separate, multi-space runs don't
    * inflate). */
  val preTokenPat: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** The pre-token pieces of `text`, in order (ARRAY<STRING>). */
  def preTokenPieces(text: Column): Column =
    regexp_extract_all(text, lit(preTokenPat), lit(0))

  /** Exploded (id, pos, piece) pre-tokenization of the corpus — one
    * narrow map-side pass (regex inside codegen, no shuffle). */
  def preTokenize(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(preTokenPieces(col(textCol))).as(Seq("pos", "piece")))

  /** (id, vector float[dim], L2-normalized) from a text column. Bucket =
    * md5-derived (engine-portable, no JVM hash dependence). Empty/short
    * docs yield the zero vector (norm 0 → left unnormalized to avoid NaN).
    */
  /** Sparse stage: (id, bucket, cnt) token-bucket counts — the
    * oracle-checkable core (md5-hex buckets reproduce in any engine). */
  def featureHashSparse(docs: DataFrame, dim: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      // split("") yields [""] and repeated spaces yield empty tokens —
      // drop them so blank docs get NO buckets (zero vector), not a
      // spurious md5("")-bucket one-hot
      .filter(length(col("tok")) > 0)
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"),
          lit(dim)).cast("int"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).cast("double").as("cnt"))

  def featureHash(docs: DataFrame, dim: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val buckets = featureHashSparse(docs, dim, idCol, textCol)
    val dense = buckets
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt"))))
        .as("m"))
      .withColumn("raw", transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("m"), i), lit(0.0))))
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("vector", transform(
        when(col("norm") > 0, expr("transform(raw, x -> x / norm)"))
          .otherwise(col("raw")),
        x => x.cast("float")))
      .select(col("id"), col("vector"))
    dense
  }

  /** End-to-end "embed and index" job: featurize a corpus and return the
    * vector table ready for [[KnnSearch]] / [[IndexBuild]] — the batch
    * replacement for the reference's embed-per-note client loop. */
  def embedCorpus(docs: DataFrame, dim: Int): DataFrame =
    featureHash(docs, dim).withColumn("deleted", lit(false))

  /** Top-`topK` TF-IDF terms per document: tf = in-doc term count,
    * idf = ln(N/df) with df = docs containing the term. The corpus-level
    * statistic (df) comes from one extra aggregation over the exploded
    * term table; N is a broadcast scalar, so the only wide ops are the two
    * hash aggregations (term keys are uniform) and the per-doc top-k
    * window — which Spark executes as WindowGroupLimit (bounded per-group
    * state, no full sort of the corpus).
    *
    * Ranking is on the score ROUNDED to 6 decimals (then term ascending):
    * mathematically-coincident scores computed via different expressions
    * (e.g. 2·ln(10) vs ln(100)) can differ by an ulp between libm
    * implementations, so ranking on the raw double is not engine-portable;
    * ranking on the displayed precision is, and makes ties explicit. */
  def tfidfTopTerms(docs: DataFrame, topK: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col("id")).orderBy(desc("tfidf_r"), asc("term"))
    // df as a window count over the tf rows themselves (the bm25Postings
    // shape, r16): the old `tf.groupBy(term)` + join re-executed the
    // whole tokenize+tf subtree a second time — same df values (tf is
    // one row per (doc, term), so the per-term row count IS the
    // document frequency), one corpus pass instead of two
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("tfidf_r",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("id"), col("term"), col("tfidf_r"),
        col("rk").cast("int").as("rk"))
  }

  /** Unigram log-likelihood quality score — the LM-perplexity corpus
    * filter (Wenzek et al., "CCNet", 2020-style) reduced to its portable
    * core: a document's mean log-probability under the corpus's own
    * unigram distribution. Low scores flag boilerplate-free gibberish
    * and rare-token noise; high scores flag repetitive common-token text
    * — the standard third axis next to the heuristic gates
    * ([[TextDedup.qualityFeatures]]) and repetition signals.
    *
    * Determinism (the [[Retrieval]] BM25 rule): per-term
    * ln(cnt/N) quantizes to integer micros (`floor(x·1e6 + 0.5)` — the
    * libm-ln 1-ulp exposure is per DISTINCT TERM), per-doc totals are
    * exact BIGINT sums, and the mean is `div` integer division —
    * truncation toward zero in BOTH engines (verified), so every output
    * column is engine-exact.
    *
    * Scale: one tokenize pass; the vocab aggregation is vocab-sized; the
    * token→logp attach is a term-keyed equi-join (the BM25 postings
    * class — AQE handles skew, and the df-ceiling argument does not
    * apply because every token must score). */
  def unigramLogLik(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val stats = toks.agg(count(lit(1)).as("n_total"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(stats))
      .select(col("term"),
        floor(log(col("cnt").cast("double") / col("n_total").cast("double"))
          * lit(1000000.0) + lit(0.5)).cast("long").as("logp6"))
    toks.join(vocab, Seq("term"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("logp6")).as("sum_logp_micro"))
      .select(col("id").as(idCol), col("n_tokens"), col("sum_logp_micro"),
        expr("sum_logp_micro div n_tokens").as("avg_logp_micro"))
  }

  /** [[unigramLogLik]] upgraded one Markov order: a document's mean
    * log-probability under a Jelinek–Mercer-interpolated bigram model of
    * the corpus itself — score(doc) = mean over bigram positions of
    * ln(λ·P(w₂|w₁) + (1−λ)·P(w₂)) with λ = 1/2, P(w₂|w₁) =
    * c(w₁w₂)/c(w₁·) over bigram counts and P(w₂) = c(w₂)/N over
    * unigrams. The interpolation is what makes the score total: an
    * unseen-bigram position backs off to the unigram term instead of
    * −∞. Captures local word ORDER (scrambled text scores like its
    * unigram bag; natural text scores higher), the signal t14's
    * order-free model cannot see.
    *
    * Determinism: the probability argument evaluates as
    * λ·(c₁₂/c₁) + λ·(c_w/N) — correctly-rounded IEEE divisions/
    * multiplies/one addition in an identical tree on any engine over
    * exact BIGINT counts; per-BIGRAM ln quantizes to integer micros
    * (the t14 1-ulp-per-distinct-key exposure), doc sums are exact
    * BIGINT, the mean is `div` (truncation toward zero, both engines).
    *
    * Scale: the t14 shape one order up — aggregations are
    * bigram-vocabulary-sized, the score attach is a (w₁, w₂)-keyed
    * equi-join, docs with < 2 tokens drop (no bigram positions). */
  def bigramLogLik(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = filter(split(col(textCol), " "), x => length(x) > 0)
    val base = docs.select(col(idCol).as("id"), t.as("t"))
    val toks = base.select(col("id"), explode(col("t")).as("term"))
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("c_w"))
    // n_uni = Σ c_w: one vocab-sized agg over `uni` instead of a second
    // corpus-wide explode of `toks` (exact BIGINT equality — the token
    // count IS the sum of per-term counts)
    val uniN = uni.agg(sum(col("c_w")).as("n_uni"))
    val bi = base.filter(size(col("t")) >= 2)
      .select(col("id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val biCnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_12"))
    // c_1 = Σ_w2 c_12: derived from the bigram-vocab table instead of a
    // THIRD corpus-wide explode+shuffle of `bi` (exact BIGINT equality —
    // occurrences with left word w1 are partitioned by their w2)
    val leftCnt = biCnt.groupBy(col("w1")).agg(sum(col("c_12")).as("c_1"))
    val lp = biCnt.join(leftCnt, Seq("w1"))
      .join(uni.withColumnRenamed("term", "w2"), Seq("w2"))
      .crossJoin(broadcast(uniN))
      .select(col("w1"), col("w2"),
        floor(log(
          lit(0.5) * (col("c_12").cast("double") / col("c_1").cast("double"))
            + lit(0.5) * (col("c_w").cast("double") / col("n_uni").cast("double")))
          * lit(1000000.0) + lit(0.5)).cast("long").as("lp6"))
    bi.join(lp, Seq("w1", "w2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp6")).as("sum_logp_micro"))
      .select(col("id").as(idCol), col("n_bigrams"), col("sum_logp_micro"),
        expr("sum_logp_micro div n_bigrams").as("avg_logp_micro"))
  }

  /** Symbol delimiter for the BPE word encoding: every symbol is wrapped
    * `D+sym+D` individually, so the pair (a,b) appears as the
    * literal `DaDDbD` (D = U+001F) and a left-to-right
    * non-overlapping string replace applies a merge with EXACT BPE
    * semantics (`aaa` + merge(a,a) → `[aa, a]`) — adjacent tokens never
    * share boundary characters, so consecutive pair occurrences all
    * match. Both Spark's `replace` and DuckDB's `replace` scan
    * left-to-right non-overlapping, which makes every training step
    * engine-portable. U+001F never occurs in text corpora (it's a C0
    * control); [[bpeTrain]] requires it absent. */
  private val D = "\u001F"

  /** Words the symbol-delimiting step can't represent faithfully: the
    * per-char `regexp_replace(w, "(.)", DcD)` uses `.`, and Java's `.`
    * skips LINE TERMINATORS (LF, CR, NEL, LS, PS) -- a word containing
    * one would come out partially delimited, producing corrupted
    * multi-char symbols holding raw U+001F. Worse, DuckDB's RE2 `.`
    * excludes only LF, so a CR-bearing word would silently DIVERGE
    * between the operator and its t29/t30 oracle. Such words are
    * excluded from training and segmentation (the same exclusion rule
    * as the existing U+001F guard; a real corpus normalizes line
    * breaks before tokenization anyway; the oracle applies the
    * identical character-class filter). */
  private def delimitable(word: Column): Column =
    !word.rlike("[\\n\\r\\u0085\\u2028\\u2029]")

  /** Distributed BPE vocabulary training (Sennrich et al. 2016, "Neural
    * Machine Translation of Rare Words with Subword Units" — the public
    * algorithm behind GPT-2/RoBERTa vocabularies): starting from
    * characters, repeatedly merge the globally most frequent adjacent
    * symbol pair. Returns the learned merge table
    * (step, left, right, merged, pair_count) — the artifact a tokenizer
    * serves from ([[bpeSegment]] applies it).
    *
    * Spark shape — the classic scale trick is built in: pair counting
    * runs over the WORD-TYPE table weighted by type counts (one
    * whitespace explode + one groupBy builds it; the type table is
    * vocabulary-sized, orders of magnitude below token count, and is the
    * only thing the loop ever touches — the corpus is scanned exactly
    * once). Each merge step is one hash aggregation over exploded
    * adjacent pairs + a driver-side argmax of ONE row (count desc, then
    * (left, right) lexicographic — fully deterministic), then a single
    * codegen'd literal `replace` projection applies the merge to every
    * word type. `nMerges` is a vocab-size knob, so the driver loop is
    * O(nMerges / batch) tiny jobs, never corpus-driven; the word table
    * re-checkpoints periodically to keep lineage linear. At a PRODUCTION
    * vocabulary (32 k–50 k merges) the sequential-job bound is the wall:
    * set `batch` (symbol-disjoint merges per count snapshot — see the
    * in-loop note; batch = 1 is exact sequential BPE, the hash-checked
    * default) to amortize one pair-count job over many merges — the
    * BpeProbe ladder measures the per-merge wall at both settings.
    *
    * Determinism: counts are exact integers, ties break lexicographic,
    * and the delimiter encoding makes each step's replace byte-identical
    * across engines — the harness oracle re-derives every step (pair
    * counts, argmax, replace) in DuckDB and hash-checks the merge table. */
  def bpeTrain(docs: DataFrame, nMerges: Int, idCol: String = "doc_id",
      textCol: String = "text", batch: Int = 1): DataFrame = {
    require(nMerges > 0, s"nMerges $nMerges")
    require(batch > 0, s"batch $batch")
    val spark = docs.sparkSession
    import spark.implicits._
    // word-type table: (delimited symbol string, count)
    var words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(D) &&
        delimitable(col("word")))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("word"), "(.)", s"$D$$1$D").as("w"),
        col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // adjacent symbol pairs of every word type, weighted by type count
      val toks = words
        .select(col("cnt"),
          split(expr("substring(w, 2, length(w) - 2)"), D + D).as("t"))
        .withColumn("n", size(col("t")))
        .filter(col("n") >= 2)
      // batch > 1 = BATCHED BPE (the fast-trainer variant): take up to
      // `batch` SYMBOL-DISJOINT pairs from one count snapshot and apply
      // them in one pass — each pass is ONE pair-count job instead of
      // `batch`, cutting the sequential-job bound from O(nMerges) to
      // O(nMerges / batch). Disjointness makes the batch sound: merging
      // (A,B) can only change counts of pairs touching A, B or the new
      // symbol AB (an adjacency (C,D) with {C,D} ∩ {A, B, AB} = ∅ is
      // neither destroyed nor created by A,B → AB), so a taken pair's
      // symbols are excluded from every LATER pick in the pass —
      // including its merged result, which can collide with a
      // pre-existing symbol string — and every count the batch acts on
      // is still exact when its merge applies (replaces chain in step
      // order, exactly as [[bpeSegment]] replays them). The
      // approximation vs step-by-step BPE: brand-new pairs born inside
      // the pass (X, AB) can't be picked until the next snapshot — the
      // classic frequency-snapshot trade every batched trainer makes.
      // batch = 1 is EXACT sequential BPE (the default; t29/t30's
      // hash-checked contract).
      val top = toks
        .withColumn("i", explode(sequence(lit(1), col("n") - 1)))
        .select(element_at(col("t"), col("i")).as("l"),
          element_at(col("t"), col("i") + 1).as("r"), col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l").asc, col("r").asc)
        .limit(math.max(batch * 8, 8)).collect()
      if (top.isEmpty) exhausted = true
      else {
        val want = math.min(batch, nMerges - step + 1)
        val touched = scala.collection.mutable.Set.empty[String]
        val take = top.iterator.map { row =>
          (row.getString(0), row.getString(1), row.getLong(2))
        }.filter { case (l, r, _) =>
          if (touched.contains(l) || touched.contains(r) ||
            touched.contains(l + r)) false
          else { touched += l; touched += r; touched += (l + r); true }
        }.take(want).toSeq
        // one projection applies the whole pass; patterns are disjoint,
        // so the chained replaces commute
        val w2 = take.foldLeft(col("w")) { case (c, (l, r, _)) =>
          replace(c, lit(s"$D$l$D$D$r$D"), lit(s"$D$l$r$D"))
        }
        take.foreach { case (l, r, pc) =>
          merges += ((step, l, r, l + r, pc)); step += 1
        }
        words = words.withColumn("w", w2)
        if ((step / batch) % 4 == 0 || batch >= 4)
          words = words.localCheckpoint()
      }
    }
    merges.toSeq.toDF("step", "left", "right", "merged", "pair_count")
  }

  /** Apply a learned merge table to a corpus: per doc, the ordered BPE
    * pieces after replaying every merge in training order over each
    * whitespace word. Serving shape: the merge list is a bounded
    * driver-side constant, so the whole segmentation is `nMerges`
    * chained literal-replace projections inside ONE codegen stage —
    * zero shuffle, zero joins; the corpus streams through map-side.
    * Output: (id, wpos, pos, piece) — word position in the doc, piece
    * position within the word.
    *
    * Words the per-char delimiting step can't represent
    * (line-terminator-bearing — see [[delimitable]]) are NOT dropped:
    * they encode as ONE opaque symbol (`D word D`), which no merge
    * pattern can match (merge patterns contain interior delimiters and
    * words never contain `D`), so they emerge as a single unsegmented
    * piece — token counts downstream (t33 packing) stay faithful to the
    * corpus. Training ([[bpeTrain]]) still excludes them: a
    * single-symbol word contributes zero adjacent pairs either way. */
  def bpeSegment(docs: DataFrame, merges: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ms = merges.select(col("step"), col("left"), col("right"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val delimited = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("wpos", "word")))
      .filter(length(col("word")) > 0 && !col("word").contains(D))
      .select(col("id"), col("wpos"),
        when(delimitable(col("word")),
            regexp_replace(col("word"), "(.)", s"$D$$1$D"))
          .otherwise(concat(lit(D), col("word"), lit(D))).as("w"))
    val replayed = ms.foldLeft(delimited) { case (df, (l, r)) =>
      df.withColumn("w",
        replace(col("w"), lit(s"$D$l$D$D$r$D"), lit(s"$D$l$r$D")))
    }
    replayed
      .select(col("id"), col("wpos"),
        posexplode(split(expr("substring(w, 2, length(w) - 2)"), D + D))
          .as(Seq("pos", "piece")))
  }
}
