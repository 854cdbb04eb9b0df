package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat", "a"),
    (2L, "the cat sat on the mat", "a"),  // exact dup of 1
    (3L, "the cat sat on the hat", "a"),  // near dup
    (4L, "completely different words here", "a"),
    (5L, "unrelated text in block b", "b")
  ).toDF("doc_id", "text", "source")

  test("exactDedup groups identical texts") {
    val out = TextDedup.exactDedup(docs)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    assert(out(1L) === 2L) // docs 1+2 collapse, representative is min id
    assert(out.values.sum === 5L)
  }

  test("minhash is order-insensitive over the token set") {
    val a = Seq((1L, "x y z")).toDF("id", "text")
      .select(TextDedup.minhash(TextDedup.tokenSet(col("text")), 0)).head.getString(0)
    val b = Seq((1L, "z x y x")).toDF("id", "text")
      .select(TextDedup.minhash(TextDedup.tokenSet(col("text")), 0)).head.getString(0)
    assert(a === b)
  }

  test("minhashNearDupPairs finds near dups and collapses exact dups first") {
    // jacc(doc1-set, doc3-set): sets {the,cat,sat,on,mat} vs {the,cat,sat,on,hat}
    // = 4/6 — use a threshold below that; doc2 collapses into doc1's rep.
    val out = TextDedup.minhashNearDupPairs(docs, nHashes = 1, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().toList
    assert(out.forall { case (a, b, _) => a < b })
    assert(!out.exists { case (a, b, _) => a == 2L || b == 2L }) // dup collapsed
    out.find { case (a, b, _) => a == 1L && b == 3L } match {
      case Some((_, _, j)) => assert(math.abs(j - 4.0 / 6.0) < 1e-6) // output is round(jacc, 6)
      case None => fail("expected (1,3) pair — band should collide at j=2/3 " +
        "with 1 hash sometimes; deterministic hashes make this stable")
    }
  }

  test("ngramJaccardPairs respects blocking (no cross-block pairs)") {
    val out = TextDedup.ngramJaccardPairs(docs, n = 2, minJaccard = 0.01,
      blockCol = "source").as[(Long, Long, Double)].collect().toList
    // doc 5 is alone in block b → never paired
    assert(!out.exists { case (a, b, _) => a == 5L || b == 5L })
    // bigram jacc(1,3): {the cat, cat sat, sat on, on the, the mat/hat}
    // common 4 of 6 distinct
    val j13 = out.collectFirst { case (1L, 3L, j) => j }
    assert(j13.exists(j => math.abs(j - 4.0 / 6.0) < 1e-6)) // round(jacc, 6)
  }

  test("shingles guard: doc shorter than n yields empty set, not a crash") {
    val out = Seq((1L, "one two")).toDF("id", "text")
      .select(TextDedup.shingles(col("text"), 3).as("s"))
      .select(size(col("s"))).head.getInt(0)
    assert(out === 0)
  }

  test("simhash: identical texts share signatures; signature is 16 bits") {
    val sigs = TextDedup.simhashSignatures(docs)
      .as[(Long, String)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs.values.forall(s => s.length == 16 && s.forall("01".contains(_))))
  }

  test("fingerprint is token-order-insensitive") {
    val fp = (t: String) => Seq((1L, t)).toDF("id", "text")
      .select(TextDedup.fingerprint(col("text"))).head.getString(0)
    assert(fp("a b c") === fp("c b a b"))
    assert(fp("a b c") !== fp("a b d"))
  }

  test("quality features: ratios for a known doc") {
    val f = TextDedup.qualityFeatures(Seq((1L, "the the cat")).toDF("id", "text"))
      .select("n_tokens", "n_uniq", "stopword_ratio").head
    assert(f.getInt(0) === 3 && f.getInt(1) === 2)
    assert(math.abs(f.getDouble(2) - 2.0 / 3.0) < 1e-12)
  }

  test("langId flags stopword-bearing text as en") {
    val out = Seq((1L, "the cat and the dog"), (2L, "gato perro sol luna"))
      .toDF("id", "text")
      .select(col("id"), TextDedup.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en" && out(2L) === "unknown")
  }

  test("deletion neighborhood: catches sym-diff ≤ 2, collapses exact dups") {
    val docs = Seq(
      (1L, "a b c d e f g h"),      // base
      (2L, "a b c d e f g i"),      // one substitution (sym diff 2) → pair
      (3L, "a b c d e f g"),        // one deletion (sym diff 1) → pair
      (4L, "h g f e d c b a"),      // same SET as 1 → collapsed, no pair
      (5L, "a b c x y z w v")       // far → no pair with base
    ).toDF("doc_id", "text")
    val pairs = TextDedup.deletionNeighborhoodPairs(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"substitution pair missing: $pairs")
    assert(pairs.contains((1L, 3L)), s"deletion pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "exact-set duplicate must collapse into its representative")
    assert(!pairs.contains((1L, 5L)), "distant pair must not match")
  }

  test("duplicatedSpans: positional counts, cross-doc only, short docs drop") {
    val docs = Seq(
      (1L, "a b c d e"),        // spans: "a b c", "b c d", "c d e"
      (2L, "x y a b c d"),      // "x y a", "y a b", "a b c", "b c d"
      (3L, "a b c a b c"),      // in-doc repeat of "a b c" ×2 + bridges
      (4L, "too short")         // < n tokens → no spans, no row
    ).toDF("doc_id", "text")
    val out = TextDedup.duplicatedSpans(docs, n = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!out.contains(4L))
    assert(out(1L) === ((3L, 2L)))  // "a b c","b c d" shared; "c d e" unique
    assert(out(2L) === ((4L, 2L)))
    // doc 3: spans = "a b c","b c a","c a b","a b c" — the two "a b c"
    // positions are dup (cross-doc), the bridge spans are unique to doc 3
    assert(out(3L) === ((4L, 2L)))
  }

  test("spanScrub: cross-doc duplicated spans removed, within-doc repeats kept") {
    val docs = Seq(
      (1L, "a b c d x y"),      // "a b c d" duplicated in doc 2 → drop 4, keep "x y"
      (2L, "p a b c d q"),      // same span → drop 4, keep "p q"
      (3L, "u v w u v w u v"),  // repeats only WITHIN the doc → nothing dropped
      (4L, "s t")               // shorter than n → no spans → untouched
    ).toDF("doc_id", "text")
    val out = TextDedup.spanScrub(docs, n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) === ((2L, 4L, h("x y"))))
    assert(out(2L) === ((2L, 4L, h("p q"))))
    assert(out(3L) === ((8L, 0L, h("u v w u v w u v"))))
    assert(out(4L) === ((2L, 0L, h("s t"))))
  }

  test("spanScrub: overlapping dup spans scrub their union; total loss hashes empty") {
    val docs = Seq(
      (1L, "a b c d e"),  // spans "a b c d" and "b c d e" both dup → all 5 covered
      (2L, "a b c d e"),  // identical doc
      (3L, "k l m n o p") // unrelated
    ).toDF("doc_id", "text")
    val out = TextDedup.spanScrub(docs, n = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) === ((0L, 5L, h(""))))
    assert(out(2L) === ((0L, 5L, h(""))))
    assert(out(3L) === ((6L, 0L, h("k l m n o p"))))
  }

  test("connectedComponents: empty pair set yields empty result, no NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(TextDedup.connectedComponents(empty).count() === 0L)
  }

  test("connectedComponents: multi-hop chain collapses to one min-label cluster") {
    // chain 1-2-3-4-5 (diameter 4, needs >1 propagation round) + island 10-11
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val out = TextDedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(out(_) == 1L), s"chain: $out")
    assert(out(10L) === 10L && out(11L) === 10L)
    assert(out.size === 7)
  }

  test("connectedComponents: pathHalving reaches the same fixpoint on a long chain") {
    // 40-node chain — the shape pathHalving exists for: plain propagation
    // needs ~diameter rounds (39 here), halving converges well inside it.
    // autoHalveAfter is pushed past maxIters on the "plain" run so it
    // exercises pure propagation.
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val plain = TextDedup.connectedComponents(pairs, maxIters = 50,
        autoHalveAfter = 100)
      .as[(Long, Long)].collect().toMap
    val halved = TextDedup.connectedComponents(pairs, pathHalving = true)
      .as[(Long, Long)].collect().toMap
    assert(plain == halved)
    assert((1L to 40L).forall(halved(_) == 1L))
  }

  test("connectedComponents: adversarial chain auto-enables halving within default budget") {
    // 300-node chain: plain propagation needs ~299 rounds — hopeless inside
    // the default maxIters=25. The auto-halving guard flips to pointer
    // doubling after 5 non-converged rounds, so the default call converges
    // (≈ 5 + log2(300) rounds) instead of warning and truncating.
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = TextDedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out.size === 300)
    assert((1L to 300L).forall(out(_) == 1L),
      "auto-halving must reach the fixpoint inside the default iteration budget")
  }

  test("dedupSelect: min-id representative kept per cluster, singletons kept") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 20L).toDF("doc_id")
    // components {1..5} and {10,11}; 20 unpaired
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val out = TextDedup.dedupSelect(docs, pairs)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.size === 8)
    for (i <- Seq(1L, 2L, 3L, 4L, 5L))
      assert(out(i) === ((1L, 5L, i == 1L)), s"doc $i: ${out(i)}")
    assert(out(10L) === ((10L, 2L, true)))
    assert(out(11L) === ((10L, 2L, false)))
    assert(out(20L) === ((20L, 1L, true)), "unpaired doc is a kept singleton")
    // exactly one keeper per cluster
    val keepers = out.collect { case (id, (c, _, true)) => c -> id }
    assert(keepers.toMap.size === keepers.size)
  }

  test("contamination: counts distinct shared n-grams and test docs") {
    val corpus = Seq(
      (1L, "a b c d e"),   // shares bigrams {a b, b c, c d, d e} with test 100
      (2L, "x y z w v"),   // no overlap
      (3L, "a b c q r")    // shares {a b, b c} with test 100
    ).toDF("doc_id", "text")
    val test = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val out = TextDedup.contamination(corpus, test, n = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((4L, 1L)))
    assert(out(3L) === ((2L, 1L)))
    assert(!out.contains(2L), "zero-overlap doc must not appear")
  }

  test("contamination: large test set falls past the broadcast gate with identical results") {
    // a held-out set big enough that pinning its grams in every executor
    // would be wrong: force the gate shut (bytes=0) and check the hint is
    // gone (AQE then picks the strategy) while results stay identical
    val corpus = (1L to 50L).map(i => (i, s"w${i % 7} w${i % 11} w${i % 13} w${i % 17} common tail"))
      .toDF("doc_id", "text")
    val test = (1L to 2000L).map(i => (i, s"w${i % 7} w${i % 11} x$i y$i common tail"))
      .toDF("doc_id", "text")
    val hinted = TextDedup.contamination(corpus, test, n = 2)
    val gated = TextDedup.contamination(corpus, test, n = 2, broadcastBytes = 0L)
    assert(hinted.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "small-side default must keep the broadcast hint")
    assert(!gated.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "gate=0 must drop the broadcast hint and leave the join to AQE")
    val a = hinted.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = gated.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("repetitionSignals: known fractions; multi-space text has no phantom bigrams") {
    val docs = Seq(
      (1L, "a b a b a"),        // bigrams: ab,ba,ab,ba → top 2/4, dup 4/4
      (2L, "u  v   w"),         // multi-space: tokens u,v,w → 2 distinct bigrams
      (3L, "solo")              // <2 tokens → no bigrams → absent
    ).toDF("doc_id", "text")
    val out = TextDedup.repetitionSignals(docs)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((4L, 0.5, 1.0)))
    assert(out(2L) === ((2L, 0.5, 0.0)), "empty tokens must not form bigrams")
    assert(!out.contains(3L))
  }

  test("tfidfTopTerms: ranks by score then term asc; rare term wins") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common other"),
      (3L, "common other other")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextFeaturizer.tfidfTopTerms(docs, topK = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(_._2).toList).toMap
    // doc 1: 'rare' df=1 → tf·ln(3) beats 'common' df=3 → tfidf 0
    assert(out(1L).head === "rare")
    // doc 2: 'other' (df=2) positive beats 'common' (df=3, tfidf=0);
    // ties at 0 broken by term asc
    assert(out(2L) === List("other", "common"))
  }

  test("semanticDedup: scaled clones drop against their originals; " +
      "distinct-direction vectors survive") {
    graft.functions.VectorFunctions.register(spark)
    // two tight direction groups + one loner; ids pick keep-lowest
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f)),   // ×2 clone of 1 → drop
      (3L, Array(0.98f, 0.2f, 0.0f)),  // cos≈0.98 to 1 → drop at τ=0.9
      (10L, Array(0.0f, 1.0f, 0.0f)),
      (11L, Array(0.0f, 3.0f, 0.0f)),  // clone of 10 → drop
      (20L, Array(0.0f, 0.0f, 1.0f))   // loner → keep
    ).toDF("id", "vector")
    val cb = graft.operators.IvfIndex.sampleCodebook(
      vecs.filter(col("id").isin(1L, 10L, 20L)), k = 3)
    val got = TextDedup.semanticDedup(vecs, cb, tau = 0.9)
      .as[(Long, Int, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false,
      10L -> true, 11L -> false, 20L -> true))
  }

  test("semanticDedup: partitioning-invariant (same keep set at any " +
      "parallelism)") {
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf001)
    val base = emb.select(col("vec_id").as("id"),
      col("embedding").as("vector"))
    val clones = base.filter(col("id") % 20 === 0)
      .select((col("id") + 100000L).as("id"),
        transform(col("vector"), x => x * lit(2.0f)).as("vector"))
    val nodes = base.unionByName(clones)
    val cb = graft.operators.IvfIndex.sampleCodebook(nodes, k = 10)
    def keeps(df: org.apache.spark.sql.DataFrame) =
      TextDedup.semanticDedup(df, cb, tau = 0.9)
        .filter(!col("keep")).select("id").as[Long].collect().toSet
    val a = keeps(nodes)
    val b = keeps(nodes.repartition(7))
    assert(a === b)
    // every injected clone is caught; no original with a unique
    // direction is dropped spuriously against this loose fixture
    val cloneIds = clones.select("id").as[Long].collect().toSet
    assert(cloneIds.subsetOf(a))
    assert((a -- cloneIds).isEmpty,
      s"unexpected non-clone drops: ${a -- cloneIds}")
  }

  test("semanticDedup: hot-cell salting is output-invariant — one " +
      "adversarial all-in-one-cluster cell, every salt factor agrees") {
    graft.functions.VectorFunctions.register(spark)
    // ADVERSARIAL: every vector points the same general direction, so
    // the assignment puts ALL of them in one cell — the skew case the
    // salted (sa, sb)-grid join exists for. 60 vectors with ids chosen
    // so clones (id+1000, x2 scale) interleave with originals.
    // direction grid spaced so the CLOSEST distinct pair stays below
    // cos 0.997 — comfortably under the tau=0.999 clone threshold
    val base = (0L until 30L).map { i =>
      (i, Array(1.0f, (i % 7).toFloat / 7f, (i % 5).toFloat / 5f))
    }
    val clones = base.map { case (i, v) => (i + 1000L, v.map(_ * 2f)) }
    val vecs = (base ++ clones).toDF("id", "vector")
    // one centroid = one cell for everything
    val cb = Seq((0, Array(1.0f, 0.0f, 0.0f))).toDF("cell", "centroid")
    def run(maxCellSide: Int) =
      TextDedup.semanticDedup(vecs, cb, tau = 0.999,
          maxCellSide = maxCellSide)
        .select("id", "cell", "keep").as[(Long, Int, Boolean)]
        .collect().toSet
    // maxCellSide 60 → g=1 (the plain join); 7 → g=9 grid; 1 → g=60:
    // the pair SET is identical, so the keep set must be too
    val plain = run(60)
    assert(run(7) === plain)
    assert(run(1) === plain)
    // and the semantics are right: every x2 clone dropped against its
    // original, every original kept (tau .999 separates the directions)
    val keeps = plain.map(r => r._1 -> r._3).toMap
    assert(base.forall { case (i, _) => keeps(i) },
      "an original was dropped")
    assert(clones.forall { case (i, _) => !keeps(i) },
      "a clone survived")
    // prebuilt-assignments path (the scale lever that skips the n x k
    // argmax): feeding the in-line assignment back in must reproduce
    // the exact output
    val prebuilt = graft.operators.IvfIndex.assign(
      vecs.select(col("id"), col("vector")), cb).select("id", "cell")
    assert(TextDedup.semanticDedup(vecs, cb, tau = 0.999,
        assignments = Some(prebuilt))
      .select("id", "cell", "keep").as[(Long, Int, Boolean)]
      .collect().toSet === plain)
  }

  test("deletion neighborhood: jaccard bound (m−1)/(m+1) holds for all pairs") {
    val pairs = TextDedup.deletionNeighborhoodPairs(
      Tables.documents(spark, sf001).limit(200))
      .select("jacc").as[Double].collect()
    // smallest doc sets in the fixture are ~20 distinct tokens → bound ~0.9;
    // assert the conservative floor that the scheme itself guarantees
    assert(pairs.forall(_ >= 0.5), s"low-similarity candidate leaked")
  }

  test("prefixJaccardPairs: EXACTLY the brute-force pair set (prefix + " +
      "length filters are lossless), partitioning-invariant") {
    val docs = Tables.documents(spark, sf001).limit(120)
      .select(col("doc_id"), col("text"))
    val tauMicro = 500000L // τ = 0.5
    val got = TextDedup.prefixJaccardPairs(docs, tauMicro)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force over token sets: every pair, exact integer test
    val sets = docs
      .select(col("doc_id"),
        array_distinct(filter(split(col("text"), " "),
          t => length(t) > 0)).as("s"))
      .as[(Long, Seq[String])].collect()
      .map { case (i, s) => i -> s.toSet }.toMap
    val brute = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).intersect(sets(b)).size.toLong
      uni = (sets(a).size + sets(b).size).toLong - inter
      if inter * 1000000L >= uni * tauMicro
    } yield (a, b, inter, uni)).toSet
    assert(brute.nonEmpty, "fixture clones should produce pairs")
    assert(got === brute)
    // same answer at a different parallelism
    val got2 = TextDedup.prefixJaccardPairs(docs.repartition(13), tauMicro)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got2 === brute)
  }
}
