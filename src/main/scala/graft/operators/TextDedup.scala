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

  /** MinHash-LSH near-dup pairs: band-bucket join for candidates, then exact
    * Jaccard verification. Returns (a_id, b_id, jacc) with a_id < b_id.
    * The bucket join is an equi-join on the band key — candidates only, never
    * all pairs; `minJaccard` re-verification removes LSH false positives. */
  def minhashNearDupPairs(docs: DataFrame, nHashes: Int, minJaccard: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val prep = docs.select(col(idCol).as("id"), tokenSet(col(textCol)).as("ts"))
      .withColumn("band", minhashBand(col("ts"), nHashes))
    val a = prep.select(col("id").as("a_id"), col("ts").as("a_ts"), col("band"))
    val b = prep.select(col("id").as("b_id"), col("ts").as("b_ts"), col("band"))
    a.join(b, Seq("band"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jacc",
        size(array_intersect(col("a_ts"), col("b_ts"))).cast("double") /
          size(array_union(col("a_ts"), col("b_ts"))))
      .filter(col("jacc") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("jacc"), 6).as("jacc"))
  }

  /** Word n-gram shingle set (n consecutive tokens joined by one space). */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
  }

  /** Exact n-gram Jaccard near-dup pairs within a blocking key (e.g. same
    * source) — the blocked-comparison baseline the LSH path approximates. */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
      blockCol: String, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val prep = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      shingles(col(textCol), n).as("sh"))
    val a = prep.select(col("id").as("a_id"), col("sh").as("a_sh"), col("blk"))
    val b = prep.select(col("id").as("b_id"), col("sh").as("b_sh"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("jacc",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jacc") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("jacc"), 6).as("jacc"))
  }

  /** 16-bit SimHash over the distinct token set: bit i is the sign of the
    * vote sum where each token votes +1/−1 by the top bit of hex digit i of
    * its md5. Returned as a 16-char '0'/'1' string (portable; no integer
    * bit-ops needed). */
  def simhash16(tokSet: Column): Column = {
    val hashed = transform(tokSet, t => md5(t))
    val bits = (0 until 16).map { i =>
      val vote = aggregate(hashed, lit(0),
        (acc, h) => acc + when(substring(h, i + 1, 1) >= "8", 1).otherwise(-1))
      when(vote >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
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
}
