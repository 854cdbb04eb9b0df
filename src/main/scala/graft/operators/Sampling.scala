package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment — the
  * reproducibility-critical pipeline ops a training corpus needs: the same
  * row lands in the same sample/split on every run, on every engine, at
  * any parallelism (no RNG stream, no partition-order dependence —
  * `df.sample`'s per-partition XORShift draws reproduce only for a fixed
  * partitioning, and not outside Spark).
  *
  * Buckets derive from an md5 prefix of (salt, key): uniform, portable
  * (DuckDB: `('0x' || substr(md5(v), 1, 15))::BIGINT`), and stable under
  * repartitioning. 10 000 buckets give 0.01% split-fraction granularity.
  */
object Sampling {

  val Buckets = 10000

  /** Full-width (60-bit) portable hash of (salt, key) — the single place
    * the md5-prefix construction lives, so the DuckDB mirror
    * (`('0x' || substr(md5(...), 1, 15))::BIGINT`) is pinned once.
    * [[bucketOf]] and rank-order consumers ([[CorpusOps.sourceCap]])
    * both derive from it. */
  def hashKey(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), key.cast("string"))),
      1, 15), 16, 10).cast("long")

  /** Uniform bucket in [0, 10000) from the salted key. */
  def bucketOf(key: Column, salt: String): Column =
    pmod(hashKey(key, salt), lit(Buckets))

  /** Keep ~`fraction` of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    df.filter(bucketOf(col(keyCol), salt) <
      lit(math.round(fraction * Buckets)))

  /** Weighted sample without replacement: k rows with inclusion
    * probability ∝ `weightCol` (Efraimidis–Spirakis A-Res: rank by
    * u^(1/w), equivalently by ln(u)/w — the importance-weighted pick a
    * pipeline uses to pull an annotation/eval subset biased toward
    * high-quality or long documents). Deterministic and engine-portable
    * like everything in this object: u derives from the salted md5 key
    * as an exact rational, ln(u) quantizes to integer micros
    * (`lnu_micro`; the libm-ln 1-ulp exposure is per distinct KEY — the
    * t14 rule), and the sort key is `lnu_micro / w` — one
    * correctly-rounded IEEE division of exactly-representable integers,
    * bit-identical on any engine. Ties break by key asc.
    *
    * Weights must be POSITIVE INTEGERS (exact cross-engine comparison;
    * a double weight column would reintroduce accumulation skew).
    * Scale: global top-k via orderBy+limit — TakeOrderedAndProject,
    * partition-local heaps + driver merge, no single-partition window.
    * Output = input columns + `lnu_micro` (the exact half of the sort
    * key, for audit/re-derivation). */
  def weightedSample(df: DataFrame, k: Int, keyCol: String,
      weightCol: String, salt: String = "wsample"): DataFrame = {
    require(k > 0, s"k $k")
    val u = (pmod(hashKey(col(keyCol), salt), lit(1000000000L)) + lit(1))
      .cast("double") / lit(1000000001.0)
    df.filter(col(weightCol) > 0)
      .withColumn("lnu_micro",
        floor(log(u) * lit(1000000.0) + lit(0.5)).cast("long"))
      .orderBy((col("lnu_micro").cast("double") /
        col(weightCol).cast("double")).desc, col(keyCol).asc)
      .limit(k)
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * for each query row, `k` pseudo-random corpus negatives — the
    * dataset-construction step behind embedding/reranker training
    * (in-batch negatives are a training-time trick; PERSISTED datasets
    * want reproducible sampled ones).
    *
    * Scale shape (the hashed-rendezvous trick, never a cross join): every
    * corpus doc lands in one of `buckets` hash buckets; each (query, j)
    * slot hashes to a bucket and takes that bucket's min-rank doc under a
    * slot-salted rank — one equi-join keyed by bucket moving
    * Q×k×(n/buckets) candidate rows, with the per-slot pick collapsing
    * map-side (min_by). Self-matches are excluded by rank (a query can
    * never draw itself); a slot landing in an empty bucket yields no row
    * (choose buckets ≪ n to make that impossible in practice).
    *
    * Determinism/portability: bucket assignment and ranks are salted md5
    * ([[hashKey]]) of ids — same negatives on any engine at any
    * parallelism, and adding corpus docs only changes slots whose bucket
    * min actually changed.
    *
    * Starvation contract: a slot hashing to an empty bucket (or a
    * size-1 bucket holding only the query itself) cannot be filled; it
    * is emitted with a NULL `neg_id` rather than silently dropped, and
    * every row carries the query's filled-slot count `n_negatives`, so a
    * caller shipping a contrastive set sees under-provisioned queries
    * (`n_negatives < k`) instead of discovering them at training time.
    * The grid join-back and the count window run over Q×k slot rows —
    * bounded by the query set, never the corpus.
    * Output: (query_id, slot, neg_id nullable, n_negatives). */
  def negativeSample(queries: DataFrame, corpus: DataFrame, k: Int,
      queryIdCol: String = "query_id", corpusIdCol: String = "doc_id",
      buckets: Int = 1024, salt: String = "neg"): DataFrame = {
    require(k > 0 && buckets > 0, s"k $k buckets $buckets")
    val docs = corpus.select(col(corpusIdCol).as("neg_id"))
      .withColumn("__b", pmod(hashKey(col("neg_id"), salt + "-b"),
        lit(buckets.toLong)))
    val slots = queries.select(col(queryIdCol).as("query_id"))
      .withColumn("slot", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__b", pmod(
        hashKey(concat(col("query_id").cast("string"), lit("#"),
          col("slot").cast("string")), salt + "-s"),
        lit(buckets.toLong)))
    val picked = slots.join(docs, Seq("__b"))
      // rank is slot-salted so the same bucket serves DIFFERENT docs to
      // different slots; a query's own doc ranks last, never first
      .withColumn("__r", when(col("neg_id") === col("query_id"),
          lit(Long.MaxValue))
        .otherwise(hashKey(concat(col("query_id").cast("string"), lit("#"),
          col("slot").cast("string"), lit("#"),
          col("neg_id").cast("string")), salt + "-r")))
      .groupBy(col("query_id"), col("slot"))
      .agg(expr("min_by(neg_id, struct(__r, neg_id))").as("neg_id"))
      .filter(col("neg_id") =!= col("query_id")) // bucket of size 1 = self
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
    slots.select(col("query_id"), col("slot"))
      .join(picked, Seq("query_id", "slot"), "left")
      .withColumn("n_negatives", count(col("neg_id")).over(w))
  }

  /** HARD negatives from a search result — the other half of
    * contrastive-pair construction ([[negativeSample]] draws RANDOM
    * negatives; retrieval/reranker training also wants negatives that
    * are CLOSE but wrong, the standard hard-negative mining step): keep
    * the rank band [lo, hi] of each query's hits, excluding the query's
    * own row. The band's lower edge skips the top ranks (likely true
    * positives or duplicates of the query); its upper edge bounds the
    * set. Works over ANY search arm's output — exact, LSH, PQ, seeded —
    * because every arm shares the (query_id, id, score, rn) contract;
    * the operator itself is one codegen filter, zero shuffle, so mining
    * cost IS the search cost. Output (query_id, neg_id, score, rn). */
  def hardNegativeBand(hits: DataFrame, lo: Int, hi: Int,
      queryIdCol: String = "query_id", idCol: String = "id"): DataFrame = {
    require(1 <= lo && lo <= hi, s"need 1 <= lo <= hi; got [$lo, $hi]")
    hits
      .filter(col(idCol) =!= col(queryIdCol) &&
        col("rn").between(lo, hi))
      .select(col(queryIdCol), col(idCol).as("neg_id"), col("score"),
        col("rn"))
  }

  /** Assign each row a named split by consecutive bucket ranges, e.g.
    * `Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)`. Weights must
    * sum to ≤ 1; any remainder falls into the LAST split (so a full
    * partition never drops rows). Adding a row never moves another row's
    * split — the stability property that keeps eval sets honest across
    * corpus versions. */
  def splitAssign(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)], salt: String = "split",
      outCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum <= 1.0 + 1e-9,
      s"split weights must sum to <= 1: $weights")
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * Buckets)
    }.tail
    val b = bucketOf(col(keyCol), salt)
    val assigned = weights.init.zip(bounds.init).foldRight(
      lit(weights.last._1)) { case (((name, _), hi), els) =>
      when(b < lit(hi), lit(name)).otherwise(els)
    }
    df.withColumn(outCol, assigned)
  }
}
