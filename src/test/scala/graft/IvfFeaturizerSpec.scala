package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, KnnSearch, TextFeaturizer}
import graft.queries.VectorQueries

class IvfFeaturizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)
  private lazy val nodesDf = VectorQueries.asVectorTable(emb)
  private lazy val queriesDf = VectorQueries.querySet(emb)

  test("preTokenize: GPT-2-style segmentation — every char covered " +
      "(pieces reassemble the text), contractions split, known cases") {
    val docs = Seq(
      (1L, "it's a test-case with 123 numbers"),
      (2L, "multi  spaced   text"),
      (3L, "don't")).toDF("doc_id", "text")
    val got = TextFeaturizer.preTokenize(docs)
      .orderBy(col("id"), col("pos"))
      .select("id", "piece").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // lossless cover: concatenating pieces reproduces the input
    assert(got(1L).mkString === "it's a test-case with 123 numbers")
    assert(got(2L).mkString === "multi  spaced   text")
    // known segmentations
    assert(got(3L) === Seq("don", "'t"))
    assert(got(1L) === Seq("it", "'s", " a", " test", "-", "case",
      " with", " 123", " numbers"))
    // multi-space runs: the greedy ` +` alternative takes the WHOLE run
    // (the documented divergence from GPT-2's `\s+(?!\S)` lookahead,
    // which RE2 can't express), so the following word starts unprefixed
    assert(got(2L) === Seq("multi", "  ", "spaced", "   ", "text"))
  }

  test("IVF: cells partition the corpus; search recall@10 beats 0.6 at nProbe=3") {
    val centroids = IvfIndex.train(nodesDf, k = 10, iters = 3)
    assert(centroids.count() === 10)
    val assigned = IvfIndex.assign(nodesDf, centroids)
    assert(assigned.count() === nodesDf.count()) // every node in exactly one cell
    assert(assigned.select("cell").distinct().count() > 1)

    val exact = KnnSearch.knnExact(nodesDf, queriesDf, 10, minSim = -2.0)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val approx = IvfIndex.search(nodesDf, centroids, queriesDf,
        k = 10, minSim = -2.0, nProbe = 3)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall > 0.6, s"IVF recall@10 = $recall")
  }

  test("IVF search with a NULL query_vec fails loudly instead of " +
      "silently returning no rows for that query") {
    val centroids = IvfIndex.train(nodesDf, k = 10, iters = 1)
    val withNull = queriesDf.limit(1)
      .withColumn("query_vec",
        org.apache.spark.sql.functions.lit(null)
          .cast("array<float>"))
      .unionByName(queriesDf.limit(3))
    val e = intercept[Exception] {
      IvfIndex.search(nodesDf, centroids, withNull,
        k = 5, minSim = -2.0, nProbe = 3).collect()
    }
    assert(e.getMessage != null)
    // valid batches keep serving
    val ok = IvfIndex.search(nodesDf, centroids, queriesDf.limit(3),
      k = 5, minSim = -2.0, nProbe = 3)
    assert(ok.count() > 0)
  }

  test("assignHierarchical: superK = k degenerates to EXACTLY the flat " +
      "assignment; the default two-level path keeps the blocking property") {
    val centroids = IvfIndex.sampleCodebook(nodesDf, k = 16)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
      df.select(col("id"), col("cell")).as[(Long, Int)].collect().toSet
    val flat = pairs(IvfIndex.assign(nodesDf, centroids))
    // exactness at full super-resolution: every super-cell holds exactly
    // its own fine centroid, so level 2 is the identity refinement
    assert(pairs(IvfIndex.assignHierarchical(nodesDf, centroids,
      superK = 16)) === flat)
    // default ~√k super-cells: every node lands in exactly one VALID
    // cell, deterministically across runs; agreement with flat assign is
    // approximate by design but must stay majority on this fixture
    val h1 = pairs(IvfIndex.assignHierarchical(nodesDf, centroids))
    val h2 = pairs(IvfIndex.assignHierarchical(nodesDf, centroids))
    assert(h1 === h2)
    assert(h1.size === flat.size) // one cell per node
    assert(h1.map(_._2).subsetOf(flat.map(_._2) ++ (0 until 16)))
    val agree = h1.intersect(flat).size.toDouble / flat.size
    assert(agree > 0.5, s"two-level agreement collapsed: $agree")
  }

  test("ordered Lloyd step matches a parallel mean of the same assignment") {
    // the order-forced fold must compute the same mathematical mean as a
    // plain parallel avg over the identical assignment (≤ float-sum ulps)
    val cb = IvfIndex.sampleCodebook(nodesDf, 10)
    val ordered = IvfIndex.lloydIterOrdered(nodesDf, cb)
      .select("cell", "pos", "m").as[(Int, Int, Double)].collect()
      .map { case (c, p, m) => (c, p) -> m }.toMap
    val parallel = IvfIndex.assign(nodesDf, cb)
      .select(col("cell"), posexplode(col("vector")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
      .select("cell", "pos", "m").as[(Int, Int, Double)].collect()
      .map { case (c, p, m) => (c, p) -> m }.toMap
    assert(ordered.keySet === parallel.keySet)
    val maxDiff = ordered.map { case (k, v) => math.abs(v - parallel(k)) }.max
    assert(maxDiff < 1e-6, s"ordered vs parallel mean drift: $maxDiff")
  }

  test("IVF training is deterministic across runs") {
    val a = IvfIndex.train(nodesDf, k = 5, iters = 2)
      .select("cell", "centroid").as[(Int, Seq[Float])].collect().toMap
    val b = IvfIndex.train(nodesDf.repartition(7), k = 5, iters = 2)
      .select("cell", "centroid").as[(Int, Seq[Float])].collect().toMap
    assert(a.keySet === b.keySet)
    // same cells; centroid means may differ in low bits across partitionings
    // (avg order), so compare with tolerance
    a.foreach { case (cell, v) =>
      v.zip(b(cell)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-4) }
    }
  }

  test("featureHash: unit-norm deterministic vectors that drive kNN") {
    val docs = Tables.documents(spark, sf001)
    val vecs = TextFeaturizer.embedCorpus(docs, dim = 32)
    assert(vecs.count() === docs.count())
    val norms = vecs.select(
      sqrt(aggregate(col("vector"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))

    // same text → same vector (pure function of content)
    val dup = TextFeaturizer.featureHash(
      docs.limit(5).union(docs.limit(5)), dim = 32)
    assert(dup.select("id", "vector").distinct().count() === 5)

    // embeddings feed search: a doc's own vector must retrieve itself first
    val q = vecs.limit(3).select(col("id").as("query_id"),
      col("vector").as("query_vec"))
    val hits = KnnSearch.knnExact(vecs, q, k = 1, minSim = -2.0)
    assert(hits.filter(col("query_id") === col("id")).count() === 3)
  }

  test("unigramLogLik: hand-computed micros on a tiny corpus") {
    // corpus tokens: a a b | b → N=4, p(a)=p(b)=1/2,
    // logp6 = floor(ln(0.5)·1e6 + 0.5) = −693147
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextFeaturizer.unigramLogLik(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((3L, -693147L * 3, -693147L)))
    assert(out(2L) === ((1L, -693147L, -693147L)))
    // repetitive common-token text scores HIGHER (less negative) than
    // rare-token text — the filtering signal the gate exists for
    val skew = Seq((1L, "x x x x x x x x x"), (2L, "y z w")).toDF("doc_id", "text")
    val s = TextFeaturizer.unigramLogLik(skew).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s(1L) > s(2L))
  }

  test("bigramLogLik: hand-computed micros; word order moves the score " +
      "where the unigram model is blind") {
    // corpus "a b a b" + "b a": unigrams a=3, b=3, N=6; bigrams from
    // doc1: ab, ba, ab; doc2: ba → c(ab)=2, c(ba)=2, c(a·)=2, c(b·)=2
    // p(b|a) = 2/2 = 1 ... wait: bigrams starting with a: ab, ab → c_1(a)=2
    // doc1 pairs (a,b),(b,a),(a,b); doc2 (b,a): c12(ab)=2, c12(ba)=2,
    // c1(a)=2, c1(b)=2, p(b|a)=1, p(a|b)=1, p uni = 1/2 each →
    // every position: ln(0.5·1 + 0.5·0.5) = ln(0.75)
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val lp75 = math.floor(math.log(0.75) * 1000000.0 + 0.5).toLong
    val out = TextFeaturizer.bigramLogLik(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((3L, lp75 * 3, lp75)))
    assert(out(2L) === ((1L, lp75, lp75)))
    // docs with < 2 tokens drop (no bigram positions)
    val short = Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")
    assert(TextFeaturizer.bigramLogLik(short).count() === 1)
    // order sensitivity: same token BAG, natural vs scrambled order —
    // the doc matching the corpus's dominant order scores higher, which
    // the order-free unigram model cannot distinguish
    val ord = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "cat the sat")).toDF("doc_id", "text")
    val b = TextFeaturizer.bigramLogLik(ord).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(b(1L) > b(4L))
    val u = TextFeaturizer.unigramLogLik(ord).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(u(1L) === u(4L))
  }

  test("bpeTrain: hand-computable merges in order, exact left-to-right " +
      "pair semantics, exhaustion stops early") {
    // corpus: "aaab" x3, "ab" x2
    //   step1 pairs: (a,a)=6 (two per aaab), (a,b)=5 -> merge (a,a) pc 6
    //   step2: aaab=[aa,a,b]: (aa,a)=3,(a,b)=3; ab: (a,b)=2 -> (a,b) pc 5
    //   step3: aaab=[aa,ab]: (aa,ab)=3 -> merged "aaab" pc 3
    //   step4: every word is one symbol -> training exhausts at 3 merges
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab ab"))
      .toDF("doc_id", "text")
    val merges = TextFeaturizer.bpeTrain(docs, nMerges = 10)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(merges === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("bpeTrain batch > 1: one snapshot takes only symbol-disjoint " +
      "merges (collisions defer to the next pass), batch = 1 semantics " +
      "unchanged, and segmentation with a batched table stays lossless") {
    // same fixture as the sequential test: (a,a)=6 then (a,b)=5 SHARE
    // symbol `a`, so a batch of 3 must take only (a,a) from the first
    // snapshot and pick up (a,b) in the second — colliding pairs are
    // deferred, never taken with stale counts
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab ab ab"))
      .toDF("doc_id", "text")
    val batched = TextFeaturizer.bpeTrain(docs, nMerges = 10, batch = 3)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // pass 1: (a,a) pc 6 alone (both (a,b) and (aa,?) touch `a`);
    // pass 2: (a,b) pc 5 alone ((aa,ab) touches ab's result... shares
    // no symbol with (a,b)? (aa,ab): l=aa r=ab — r = merged of (a,b),
    // excluded by the touched-set rule; pass 3: (aa,ab) pc 3
    assert(batched === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)),
      "batched training must defer colliding pairs, not take them stale")
    // a richer corpus: batched table segments losslessly
    val rich = Tables.documents(spark, sf001).limit(100)
      .select(col("doc_id"), col("text"))
    val merges = TextFeaturizer.bpeTrain(rich, nMerges = 12, batch = 4)
    assert(merges.count() === 12)
    val seg = TextFeaturizer.bpeSegment(rich, merges)
    val rebuilt = seg.groupBy(col("id"), col("wpos"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        x => x.getField("piece")), "").as("rejoined"))
    val orig = rich
      .select(col("doc_id").as("id"),
        posexplode(split(col("text"), " ")).as(Seq("wpos", "orig_word")))
      .filter(length(col("orig_word")) > 0)
    val joined = rebuilt.join(orig, Seq("id", "wpos"))
    assert(joined.count() === orig.count())
    assert(joined.filter(col("rejoined") =!= col("orig_word")).count() === 0)
  }

  test("bpeSegment: replaying the merges reconstructs each word from its " +
      "pieces, and a trained vocab compresses the training corpus") {
    val docs = Tables.documents(spark, sf001).limit(100)
      .select(col("doc_id"), col("text"))
    val merges = TextFeaturizer.bpeTrain(docs, nMerges = 12)
    assert(merges.count() === 12) // fixture text is rich enough
    val seg = TextFeaturizer.bpeSegment(docs, merges)
    // pieces joined in piece order reconstruct the original text's
    // whitespace words — segmentation never loses or reorders a char
    val rebuilt = seg.groupBy(col("id"), col("wpos"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        x => x.getField("piece")), "").as("rejoined"))
    val orig = docs
      .select(col("doc_id").as("id"),
        posexplode(split(col("text"), " ")).as(Seq("wpos", "orig_word")))
      .filter(length(col("orig_word")) > 0)
    val joined = rebuilt.join(orig, Seq("id", "wpos"))
    assert(joined.count() === orig.count())
    assert(joined.filter(col("rejoined") =!= col("orig_word")).count() === 0)
    // the learned vocab compresses: fewer pieces than characters
    val nChars = orig.agg(sum(length(col("orig_word")))).head().getLong(0)
    assert(seg.count() < nChars)
  }

  test("bpeSegment: line-terminator-bearing words emerge as ONE " +
      "unsegmented piece (not dropped) — token counts stay faithful") {
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab a\nb ab"))
      .toDF("doc_id", "text")
    val merges = TextFeaturizer.bpeTrain(docs, nMerges = 3)
    val seg = TextFeaturizer.bpeSegment(docs, merges)
    val odd = seg.filter(col("id") === 2L && col("wpos") === 1)
      .select(col("pos"), col("piece"))
      .as[(Int, String)].collect().toSeq
    assert(odd === Seq((0, "a\nb"))) // single piece, original bytes intact
    // every whitespace word of doc 2 is represented
    assert(seg.filter(col("id") === 2L)
      .select(col("wpos")).distinct().count() === 3)
  }
}
