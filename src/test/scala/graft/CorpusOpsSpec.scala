package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Per-source quotas/blocklists and the training-mixture table
  * ([[CorpusOps]]). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq.tabulate(30) { i =>
    (i.toLong, s"tok$i word common text", s"src${i % 3}", if (i % 2 == 0) "en" else "de")
  }.toDF("doc_id", "text", "source", "lang")

  test("sourceCap: quota binds per source, blocklist drops, ranks contiguous") {
    val out = CorpusOps.sourceCap(docs, maxPerSource = 4,
        blocklist = Seq("src2"))
      .select("doc_id", "source", "src_rank")
      .as[(Long, String, Int)].collect()
    assert(!out.exists(_._2 == "src2"), "blocklisted source must vanish")
    val bySrc = out.groupBy(_._2)
    assert(bySrc.keySet === Set("src0", "src1"))
    for ((_, rows) <- bySrc) {
      assert(rows.length === 4) // 10 docs per source, capped at 4
      assert(rows.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4))
    }
  }

  test("sourceCap: survivors are growth-stable (adding docs never swaps another's fate)") {
    val kept = CorpusOps.sourceCap(docs, maxPerSource = 4)
      .select("doc_id").as[Long].collect().toSet
    val grown = docs.unionByName(
      Seq((100L, "new doc", "src0", "en")).toDF("doc_id", "text", "source", "lang"))
    val keptGrown = CorpusOps.sourceCap(grown, maxPerSource = 4)
      .select("doc_id").as[Long].collect().toSet
    // hash rank is salted-md5 of the id: an added doc either displaces the
    // last-ranked survivor of ITS source or changes nothing — survivors of
    // untouched sources are identical
    val src0 = docs.filter(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet + 100L
    assert((kept -- src0) === (keptGrown -- src0))
  }

  test("sourceCap: cap larger than any source passes everything through") {
    val out = CorpusOps.sourceCap(docs, maxPerSource = 1000)
    assert(out.count() === 30L)
  }

  test("sourceCap: null-source docs survive a blocklist as their own group") {
    val withNull = docs.unionByName(
      Seq((200L, "unattributed", null.asInstanceOf[String], "en"))
        .toDF("doc_id", "text", "source", "lang"))
    val out = CorpusOps.sourceCap(withNull, maxPerSource = 4,
        blocklist = Seq("src2"))
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(200L),
      "a NULL source is not blocklisted — bare !isin would drop it")
  }

  test("chunkByTokens: every token covered exactly once per stride " +
      "step, overlap = window - stride, short docs yield one chunk") {
    val d = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 toks
      (2L, (1 to 10).map(i => s"v$i").mkString(" ")),  // 10 toks < window
      (3L, (1 to 64).map(i => s"u$i").mkString(" "))   // exactly one window
    ).toDF("doc_id", "text")
    val got = CorpusOps.chunkByTokens(d, window = 64, stride = 48)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "n_chunk_toks",
        "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
    // doc 1: ceil((100-64)/48)+1 = 2 chunks — [0,64) and [48,100)
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq
      === Seq((0L, 0L, 64L), (1L, 48L, 52L)))
    // overlap region: last 16 tokens of chunk 0 == first 16 of chunk 1
    val c0 = d1(0)._5.split(" ")
    val c1 = d1(1)._5.split(" ")
    assert(c0.takeRight(16).toSeq === c1.take(16).toSeq)
    // chunk text is the exact slice
    assert(c1.head === "w49" && c1.last === "w100")
    // short doc and exact-window doc: one full-coverage chunk each
    assert(got.filter(_._1 == 2L).map(c => (c._3, c._4)).toSeq
      === Seq((0L, 10L)))
    assert(got.filter(_._1 == 3L).map(c => (c._3, c._4)).toSeq
      === Seq((0L, 64L)))
  }

  test("mixtureStats: exact counts and integer-micro shares") {
    val tiny = Seq(
      (1L, "a b c d", "s1", "en"),   // 4 tokens
      (2L, "a b", "s1", "en"),       // 2 tokens
      (3L, "x y z w", "s2", "de")    // 4 tokens
    ).toDF("doc_id", "text", "source", "lang")
    val out = CorpusOps.mixtureStats(tiny)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("en", "s1")) === ((2L, 6L, 600000L)))
    assert(out(("de", "s2")) === ((1L, 4L, 400000L)))
  }

  test("microShare: exact at web-scale magnitudes where naive n*1e6 overflows") {
    // (n, total) pairs around 100TB-corpus scale: naive n*1000000 wraps
    // Long for n > ~9.2e12; the decomposition must match BigInt math
    val cases = Seq(
      (9300000000000L, 25000000000000L),   // 9.3e12 of 2.5e13 (overflow zone)
      (24999999999999L, 25000000000000L),  // ~the whole share
      (1L, 25000000000000L),               // tiny share → 0
      (7L, 9L),                            // small sanity
      (9200000000000000L, 9200000000000000L)) // at the documented bound
    val df = cases.toDF("n", "t")
      .select(CorpusOps.microShare("n", "t").as("got"),
        col("n"), col("t"))
    for (r <- df.collect()) {
      val want = (BigInt(r.getLong(1)) * 1000000 / BigInt(r.getLong(2))).toLong
      assert(r.getLong(0) === want, s"n=${r.getLong(1)} t=${r.getLong(2)}")
    }
  }

  test("mixtureStats: shares are exact integer division (no float off-by-one)") {
    // 3 sources × 1 token each: 1e6/3 = 333333 with div, where a float
    // quotient could floor to 333332 or round to 333334
    val tiny = Seq(
      (1L, "a", "s1", "en"), (2L, "b", "s2", "en"), (3L, "c", "s3", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val shares = CorpusOps.mixtureStats(tiny)
      .select("share_micro").as[Long].collect().toSeq
    assert(shares === Seq(333333L, 333333L, 333333L))
  }

  test("resampleToMixture: binding source keeps all, others thin to " +
      "exact micro rates, untargeted sources drop") {
    // 10 docs × 4 tokens per source: src0..src2 all have 40 tokens.
    // targets src0:2, src1:1 → src0 is binding (keeps 100%), src1 rate
    // = 1e6·1·40/(40·2) = 500000, src2 untargeted → gone
    val out = CorpusOps.resampleToMixture(docs,
        targets = Map("src0" -> 2L, "src1" -> 1L))
      .as[(Long, String, Long, Long)].collect()
    assert(!out.exists(_._2 == "src2"))
    val src0 = out.filter(_._2 == "src0")
    assert(src0.length === 10 && src0.forall(_._4 === 1000000L))
    val src1 = out.filter(_._2 == "src1")
    assert(src1.forall(_._4 === 500000L))
    // survivors are exactly the docs whose salted micro-bucket clears
    // the rate — recompute the rule independently
    val buckets = docs.filter(col("source") === "src1")
      .select(col("doc_id"),
        pmod(graft.operators.Sampling.hashKey(col("doc_id"), "mix"),
          lit(1000000L)).as("b"))
      .as[(Long, Long)].collect().toMap
    val wantSrc1 = buckets.filter(_._2 < 500000L).keySet
    assert(src1.map(_._1).toSet === wantSrc1)
    assert(wantSrc1.nonEmpty && wantSrc1.size < 10) // the thinning is real
    // partitioning invariance
    val re = CorpusOps.resampleToMixture(docs.repartition(7),
        targets = Map("src0" -> 2L, "src1" -> 1L))
      .as[(Long, String, Long, Long)].collect()
    assert(re.toSet === out.toSet)
  }

  test("resampleToMixture: guards reject empty/non-positive targets and " +
      "targets disjoint from the corpus") {
    intercept[IllegalArgumentException](
      CorpusOps.resampleToMixture(docs, targets = Map.empty))
    intercept[IllegalArgumentException](
      CorpusOps.resampleToMixture(docs, targets = Map("src0" -> 0L)))
    intercept[IllegalArgumentException](
      CorpusOps.resampleToMixture(docs, targets = Map("nope" -> 1L)))
  }

  test("mixtureDrift: hand-computed KL terms; identical snapshots give " +
      "zero drift; disjoint-support sources drop") {
    val a = Seq(
      (1L, "a b c d e f", "s1"), (2L, "a b", "s2"),     // s1: 6, s2: 2
      (3L, "x y", "onlyA")).toDF("doc_id", "text", "source")
    val b = Seq(
      (4L, "a b c d", "s1"), (5L, "a b c d", "s2"),     // s1: 4, s2: 4
      (6L, "x y", "onlyB")).toDF("doc_id", "text", "source")
    val out = CorpusOps.mixtureDrift(a, b)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set("s1", "s2")) // disjoint support drops
    // totals include ALL sources on each side: T_a = 10, T_b = 10
    val (_, na1, nb1, p1, q1, lnr1, c1) = out("s1")
    assert((na1, nb1) === ((6L, 4L)))
    assert(p1 === 600000L && q1 === 400000L)
    val wantLnr1 = math.floor(
      math.log((6.0 / 10.0) / (4.0 / 10.0)) * 1000000.0 + 0.5).toLong
    assert(lnr1 === wantLnr1 && c1 === p1 * wantLnr1)
    val (_, _, _, p2, q2, lnr2, c2) = out("s2")
    assert(p2 === 200000L && q2 === 400000L)
    assert(lnr2 < 0 && c2 === p2 * lnr2) // shrunk source: negative term
    // identical snapshots: every log-ratio and contribution is exactly 0
    val same = CorpusOps.mixtureDrift(a, a)
      .select("lnr_micro", "contrib_micro2")
      .as[(Long, Long)].collect()
    assert(same.nonEmpty && same.forall(_ == ((0L, 0L))))
  }

  test("packSequences: hand-computed fragments, boundary docs split") {
    // token counts [3, 4, 2] at budget 4: offsets 0, 3, 7 →
    //   doc 1 fits seq 0; doc 2 splits 1+3 across seqs 0/1;
    //   doc 3 splits 1+1 across seqs 1/2
    val tiny = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i")).toDF("doc_id", "text")
    val got = CorpusOps.packSequences(tiny, seqTokens = 4)
      .orderBy("seq_id", "pos_in_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got === List(
      (0L, 1L, 0L, 3L, 0L), (0L, 2L, 0L, 1L, 3L),
      (1L, 2L, 1L, 3L, 0L), (1L, 3L, 0L, 1L, 3L),
      (2L, 3L, 1L, 1L, 0L)))
  }

  test("packSequences: invariants at corpus shape + partitioning " +
      "invariance of the two-level prefix sum") {
    val base = CorpusOps.packSequences(docs, seqTokens = 7)
    val rows = base.as[(Long, Long, Long, Long, Long)].collect()
    // every sequence except the last is exactly full
    val bySeq = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val lastSeq = bySeq.map(_._1).max
    for ((seq, frs) <- bySeq if seq != lastSeq)
      assert(frs.map(_._4).sum === 7L, s"seq $seq not full")
    // fragments within a sequence tile it: sorted pos_in_seq is the
    // running sum of fragment lengths from 0
    for ((seq, frs) <- bySeq) {
      val sorted = frs.sortBy(_._5)
      sorted.foldLeft(0L) { case (expectPos, f) =>
        assert(f._5 === expectPos, s"gap in seq $seq")
        expectPos + f._4
      }
    }
    // fragments per doc cover the doc contiguously
    for ((doc, frs) <- rows.groupBy(_._2)) {
      val sorted = frs.sortBy(_._3)
      assert(sorted.head._3 === 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 === b._3, s"doc $doc gap")
        case _ =>
      }
    }
    // same fragments no matter how the input arrives partitioned
    val shuffled = CorpusOps.packSequences(
      docs.repartition(7, col("source")), seqTokens = 7, partitions = 3)
    assert(shuffled.as[(Long, Long, Long, Long, Long)].collect().toSet ===
      rows.toSet)
  }

  test("lengthBuckets: monotone in length, equal lengths share a bucket, " +
      "balanced within hot-length limits, partitioning-invariant") {
    val docs = (0 until 80).map { i =>
      (i.toLong, (0 to i % 16).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text") // lengths 1..16, 5 docs each
    val got = CorpusOps.lengthBuckets(docs, nBuckets = 4)
      .select("doc_id", "n_toks", "bucket")
      .as[(Long, Long, Int)].collect()
    assert(got.length === 80)
    // same length → same bucket; bucket monotone nondecreasing in length
    val byLen = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(byLen.values.forall(_.size === 1))
    val ordered = byLen.toSeq.sortBy(_._1).map(_._2.head)
    assert(ordered === ordered.sorted)
    assert(ordered.head === 0 && ordered.last === 3)
    // exact quartiles here: 16 lengths × 5 docs → 4 lengths per bucket
    val perBucket = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(perBucket === Map(0 -> 20, 1 -> 20, 2 -> 20, 3 -> 20))
    val got2 = CorpusOps.lengthBuckets(docs.repartition(7), nBuckets = 4)
      .select("doc_id", "n_toks", "bucket")
      .as[(Long, Long, Int)].collect()
    assert(got2.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("epochOrder: prefixes are source-balanced, epochs re-deal, " +
      "NULL source forms its own stream, partitioning-invariant") {
    val docs = (0 until 30).map { i =>
      val src = if (i % 10 == 9) None else Some(s"s${i % 3}")
      (i.toLong, s"text $i", src)
    }.toDF("doc_id", "text", "source")
    val e1 = CorpusOps.epochOrder(docs, epoch = 1L)
      .select("doc_id", "source", "rank_in_source", "interleave_key")
      .as[(Long, Option[String], Long, Long)].collect()
    assert(e1.length === 30)
    // interleave keys are distinct; any stride-aligned prefix carries
    // near-equal per-source counts (4 streams: s0/s1/s2/null)
    assert(e1.map(_._4).distinct.length === 30)
    val prefix = e1.sortBy(_._4).take(12)
    val counts = prefix.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.values.forall(c => c >= 2 && c <= 4), s"clumped: $counts")
    assert(counts.keySet.contains(None), "null stream missing from prefix")
    // a different epoch re-deals the within-source order
    val e2 = CorpusOps.epochOrder(docs, epoch = 2L)
      .select("doc_id", "interleave_key").as[(Long, Long)].collect()
    assert(e2.sortBy(_._2).map(_._1).toSeq !==
      e1.sortBy(_._4).map(_._1).toSeq)
    // deterministic under repartitioning
    val e1b = CorpusOps.epochOrder(docs.repartition(5), epoch = 1L)
      .select("doc_id", "interleave_key").as[(Long, Long)].collect()
    assert(e1b.sortBy(_._1).toSeq ===
      e1.map(r => (r._1, r._4)).sortBy(_._1).toSeq)
  }
}
