package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Manual scale probe for the text-pipeline operators (not part of the
  * driver harness) — evidence for the SCALING.md claims about the
  * contamination broadcast gate and connected-components auto path-halving
  * at sizes far beyond the committed fixtures.
  *
  * Usage:
  *   sbt "runMain graft.TextScaleProbe contam <corpusDocs> <testDocs>"
  *   sbt "runMain graft.TextScaleProbe cc <chainLength>"
  *
  * Documents are synthetic: ~40 tokens drawn from a 50k-word vocabulary by
  * hash, generated distributed (nothing collected), with a shared phrase
  * every few docs so the contamination join has real matches.
  */
object TextScaleProbe {

  def syntheticDocs(spark: SparkSession, n: Long, salt: Int): DataFrame = {
    val toks = transform(sequence(lit(0), lit(39)),
      j => concat(lit("w"), pmod(hash(col("id") * 7 + salt, j), lit(50000))))
    // every 5th doc carries a fixed phrase → guaranteed cross-set n-gram hits
    val text = when(col("id") % 5 === 0,
        concat_ws(" ", concat_ws(" ", toks), lit("shared phrase marker tokens here")))
      .otherwise(concat_ws(" ", toks))
    spark.range(n).select(col("id").as("doc_id"), text.as("text"))
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "contam"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    mode match {
      case "contam" =>
        val nCorpus = if (args.length > 1) args(1).toLong else 200000L
        val nTest = if (args.length > 2) args(2).toLong else 50000L
        // DIFFERENT salts: the sets must overlap only via the every-5th-doc
        // shared phrase, not be byte-identical prefixes of each other (same
        // salt would measure a degenerate near-total-overlap join)
        val corpus = syntheticDocs(spark, nCorpus, salt = 1).localCheckpoint()
        val test = syntheticDocs(spark, nTest, salt = 2).localCheckpoint()
        corpus.count(); test.count()
        // hinted: force the broadcast (the default small-benchmark path);
        // gated: gate shut, join unhinted — AQE picks the strategy
        val (nHinted, tHinted) = timed {
          TextDedup.contamination(corpus, test, n = 3,
            broadcastBytes = Long.MaxValue).count()
        }
        val (nGated, tGated) = timed {
          TextDedup.contamination(corpus, test, n = 3,
            broadcastBytes = 0L).count()
        }
        require(nHinted == nGated, s"gate changed results: $nHinted vs $nGated")
        println(s"""{"mode":"contam","corpus_docs":$nCorpus,""" +
          s""""test_docs":$nTest,"matched_docs":$nHinted,""" +
          s""""hinted_broadcast_sec":$tHinted,"gated_unhinted_sec":$tGated}""")

      case "prefixjoin" =>
        // exact PPJoin-style similarity join at realistic vocabulary
        // sparsity (50 k types): every 20th doc gets a truncated clone
        // (trigram Jaccard ≈ 0.9), the join must find exactly those
        // pairs at τ = 0.5 with sub-quadratic wall
        val n = if (args.length > 1) args(1).toLong else 100000L
        val base = syntheticDocs(spark, n, salt = 3)
        val clones = base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 38)).as("text"))
        val docs = base.unionByName(clones).localCheckpoint()
        docs.count()
        val (pairs, t) = timed {
          TextDedup.prefixJaccardPairs(docs, tauMicro = 500000L,
            tokenFn = tx => TextDedup.shingles(tx, 3)).count()
        }
        println(s"""{"mode":"prefixjoin","docs":${n + n / 20},""" +
          s""""clone_pairs_expected":${n / 20},"pairs":$pairs,""" +
          s""""wall_sec":$t}""")

      case "cc" =>
        val len = if (args.length > 1) args(1).toLong else 100000L
        // worst-case shape: one chain of `len` nodes (diameter len−1).
        // Plain propagation needs ~len rounds; the auto-halving guard must
        // converge in ~5 + log2(len) inside the default 25-round budget.
        val pairs = spark.range(1, len)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
          .localCheckpoint()
        pairs.count()
        val (ok, tCc) = timed {
          val lab = TextDedup.connectedComponents(pairs)
          lab.agg(max(col("cluster_id")), count(lit(1))).head() match {
            case r => r.getLong(0) == 1L && r.getLong(1) == len
          }
        }
        require(ok, "chain did not collapse to the min label")
        println(s"""{"mode":"cc","chain_len":$len,"converged":true,""" +
          s""""auto_halving_sec":$tCc}""")

      case "pack" =>
        // the two-level prefix sum at millions of docs: no corpus-sized
        // single-partition window anywhere, so wall-clock should stay
        // near-linear in n and flat in seqTokens
        val n = if (args.length > 1) args(1).toLong else 5000000L
        val budget = if (args.length > 2) args(2).toInt else 4096
        val docs = syntheticDocs(spark, n, salt = 3).localCheckpoint()
        docs.count()
        val (nFrags, tPack) = timed {
          graft.operators.CorpusOps.packSequences(docs, budget).count()
        }
        println(s"""{"mode":"pack","docs":$n,"seq_tokens":$budget,""" +
          s""""fragments":$nFrags,"pack_sec":$tPack}""")

      case "store" =>
        // the CorpusStore facade end-to-end at scale: every default-off
        // stage enabled (gate, cap, exact dedup, resample, split, pack)
        // over synthetic sourced docs — evidence that ONE assemble() call
        // stays near-linear in corpus size (each stage's own scale story
        // is measured elsewhere; this measures their composition +
        // the generation write)
        val n = if (args.length > 1) args(1).toLong else 1000000L
        val docs = syntheticDocs(spark, n, salt = 4)
          .withColumn("source",
            concat(lit("src"), pmod(col("doc_id"), lit(20))))
          .withColumn("lang", lit("en"))
          .localCheckpoint()
        docs.count()
        val store = CorpusStore.openOrCreate(spark,
          graft.util.Fs.tempDirDeletedOnExit("graft-store-probe"))
        val (_, tPut) = timed { store.putDocuments(docs) }
        val (_, tAssemble) = timed {
          store.assemble(CorpusStore.AssemblyParams(
            minTokens = 5, minQuality = 0.1,
            maxPerSource = (n / 25).toInt,
            targets = Map("src1" -> 3L, "src2" -> 1L, "src3" -> 2L),
            seqTokens = 2048))
        }
        val kept = store.trainingDocs.count()
        val frags = store.trainingSequences.count()
        println(s"""{"mode":"store","docs":$n,"put_sec":$tPut,""" +
          s""""assemble_sec":$tAssemble,"kept_docs":$kept,""" +
          s""""fragments":$frags}""")

      case "storefull" =>
        // the FULL-STAGE assemble: every optional drop stage enabled at
        // once — gate, cap, exact dedup, MinHash near-dup, SEMANTIC
        // dedup (4b, over synthetic embeddings), decontamination (4c),
        // DSIR selection (4d), resample, split, pack — the composition
        // the "store" mode leaves partly off. Semantic dedup's k grows
        // as √n (the SemDeDup contract: k must grow with the corpus;
        // with the broadcast-argmax assign this stage is Θ(n·k + n²/k)
        // = Θ(n^1.5) at k = √n — the honest cost of the operator at
        // probe scale; a 100 TB deployment amortizes assignment through
        // the persisted IVF artifacts instead).
        val n = if (args.length > 1) args(1).toLong else 300000L
        // optional third arg: comma-set of stages to enable (default all)
        // — nd (MinHash near-dup), sem (semantic), contam, dsir
        val stages: Set[String] =
          if (args.length > 2) args(2).split(",").toSet
          else Set("nd", "sem", "contam", "dsir")
        val docs = syntheticDocs(spark, n, salt = 4)
          .withColumn("source",
            concat(lit("src"), pmod(col("doc_id"), lit(20))))
          .localCheckpoint()
        val emb = spark.range(n).select(col("id").as("doc_id"),
            transform(sequence(lit(0), lit(31)),
              j => ((pmod(hash(col("id"), j), lit(1000)).cast("float") /
                lit(1000.0f)) + lit(0.05f)).cast("float")).as("vector"))
          .localCheckpoint()
        val bench = syntheticDocs(spark, 2000L, salt = 9).localCheckpoint()
        val target = syntheticDocs(spark, 20000L, salt = 4)
          .filter(col("doc_id") % 7 === 0).localCheckpoint()
        docs.count(); emb.count(); bench.count(); target.count()
        val store = CorpusStore.openOrCreate(spark,
          graft.util.Fs.tempDirDeletedOnExit("graft-storefull-probe"))
        val (_, tPut) = timed { store.putDocuments(docs) }
        val semK = math.max(64, math.sqrt(n.toDouble).toInt)
        // `sempre`: pre-assign the embeddings ONCE (the persisted-IVF-
        // artifact pattern) and hand assemble the (id, cell) table —
        // measures the semanticAssignments lever that skips the O(n·k)
        // in-line argmax. Cells differ from the in-line run's
        // (codebook over all ids vs survivors) — the keep rule is
        // partition-relative either way; this measures WALL, not a
        // fixed output.
        val (semPre, tPreAssign) =
          if (!stages("sempre")) (None, 0.0)
          else {
            graft.functions.VectorFunctions.register(spark)
            val (a, t) = timed {
              val cb = graft.operators.IvfIndex.sampleCodebook(
                emb.select(col("doc_id").as("id"), col("vector")), semK)
              val asg = graft.operators.IvfIndex.assign(
                  emb.select(col("doc_id").as("id"), col("vector")), cb)
                .select(col("id"), col("cell")).localCheckpoint()
              asg.count(); asg
            }
            (Some(t -> a), t)
          }
        val (_, tAssemble) = timed {
          store.assemble(CorpusStore.AssemblyParams(
            minTokens = 5, minQuality = 0.1,
            maxPerSource = (n / 25).toInt,
            nearDupJaccard = if (stages("nd")) 0.9 else 0.0, nHashes = 8,
            benchmark = if (stages("contam")) Some(bench) else None,
            maxSharedNgrams = 10,
            embeddings = if (stages("sem")) Some(emb) else None,
            semanticTau = 0.95, semanticK = semK,
            semanticAssignments = semPre.map(_._2),
            dsirTarget = if (stages("dsir")) Some(target) else None,
            dsirK = (n / 4).toInt,
            targets = Map("src1" -> 3L, "src2" -> 1L, "src3" -> 2L),
            seqTokens = 2048))
        }
        val kept = store.trainingDocs.count()
        val frags = store.trainingSequences.count()
        // manifest cross-check: the data card's output count must equal
        // the served generation's
        val manifestN = """"n_output_docs":\s*(\d+)""".r
          .findFirstMatchIn(store.manifest).map(_.group(1).toLong)
          .getOrElse(-1L)
        println(s"""{"mode":"storefull","docs":$n,"sem_k":$semK,""" +
          s""""put_sec":$tPut,"pre_assign_sec":$tPreAssign,""" +
          s""""assemble_sec":$tAssemble,""" +
          s""""kept_docs":$kept,"fragments":$frags,""" +
          s""""manifest_output_docs":$manifestN,""" +
          s""""manifest_matches":${manifestN == kept}}""")

      case "semscan" =>
        // the semantic-dedup PAIR SCAN in isolation at |cell| held
        // constant (the SemDeDup contract: k grows with n so cells stay
        // bounded): assignments are synthesized hash-cells of ~256
        // members — exactly what a persisted coarse quantizer provides
        // at scale — so the measured wall is the per-cell O(Σ|cell|²)
        // pair join + keep attach alone, which must stay NEAR-LINEAR in
        // n when |cell| is fixed (pairs = n·|cell|).
        val n = if (args.length > 1) args(1).toLong else 1000000L
        graft.functions.VectorFunctions.register(spark)
        val vecs = ScaleProbe.syntheticVectors(spark, n, 32)
          .localCheckpoint()
        val cells = math.max(16L, n / 256L)
        val asg = vecs.select(col("id"),
            pmod(xxhash64(col("id")), lit(cells)).cast("int").as("cell"))
          .localCheckpoint()
        vecs.count(); asg.count()
        val dummyCb = {
          import spark.implicits._
          Seq((0, Seq(0f))).toDF("cell", "centroid")
        }
        val (nDropped, tScan) = timed {
          TextDedup.semanticDedup(vecs, dummyCb, tau = 0.95,
              assignments = Some(asg))
            .filter(!col("keep")).count()
        }
        println(s"""{"mode":"semscan","n":$n,"cells":$cells,""" +
          s""""scan_sec":$tScan,"n_dropped":$nDropped}""")

      case "ingest" =>
        // delta-chain ingest cost: per-batch appendDocuments time must be
        // ~flat in CORPUS size (O(batch) deltas) until the compactEvery-th
        // append folds the chain (O(corpus), amortized). Run at two corpus
        // sizes to see the flat part stay flat.
        val n = if (args.length > 1) args(1).toLong else 200000L
        val nBatches = if (args.length > 2) args(2).toInt else 8
        val batchSize = 1000L
        val base = syntheticDocs(spark, n, salt = 5).localCheckpoint()
        base.count()
        val store = CorpusStore.openOrCreate(spark,
          graft.util.Fs.tempDirDeletedOnExit("graft-ingest-probe"),
          compactEvery = nBatches) // the LAST append triggers compaction
        val (_, tPut) = timed { store.putDocuments(base) }
        val times = (1 to nBatches).map { i =>
          val batch = syntheticDocs(spark, batchSize, salt = 100 + i)
            .select((col("doc_id") + n + i.toLong * batchSize).as("doc_id"),
              col("text"))
          timed { store.appendDocuments(batch) }._2
        }
        val (total, tRead) = timed { store.documents.count() }
        require(total == n + nBatches * batchSize,
          s"ingest lost rows: $total")
        println(s"""{"mode":"ingest","corpus_docs":$n,""" +
          s""""batch_docs":$batchSize,"put_sec":$tPut,""" +
          s""""delta_append_sec":[${times.init.mkString(",")}],""" +
          s""""compacting_append_sec":${times.last},""" +
          s""""read_after_compact_sec":$tRead}""")

      case "cdc" =>
        // segmented CDC scan on multi-MB assets: segChars=4096 bounds
        // per-row memory; segChars=1<<30 reproduces the old
        // whole-asset-array-in-one-row shape for comparison (identical
        // output, unbounded per-row allocation).
        val nAssets = if (args.length > 1) args(1).toInt else 8
        val charsPer = if (args.length > 2) args(2).toInt else 1 << 19
        // aperiodic hash-derived tokens (a repeated literal would cycle
        // the window fingerprints and yield no interior boundaries);
        // every second asset shares the previous asset's token stream
        // with a shifted head so chunk-level dedup has real hits
        val nToks = charsPer / 5
        val toks = transform(sequence(lit(0), lit(nToks - 1)),
          j => conv(pmod(hash((col("id") / 2).cast("int"), j),
            lit(1679616L)).cast("string"), 10, 36))
        val assets = spark.range(nAssets)
          .select(col("id").as("asset_id"),
            concat(concat(lit("asset "), col("id"), lit(" head ")),
              concat_ws(" ", toks)).as("payload_text"))
          .localCheckpoint()
        assets.count()
        val (c1, tSeg) = timed {
          operators.Multimodal.cdcChunks(assets, windowBytes = 8,
            boundaryMod = 4096, segChars = 4096).count()
        }
        val (c2, tWhole) = timed {
          operators.Multimodal.cdcChunks(assets, windowBytes = 8,
            boundaryMod = 4096, segChars = 1 << 30).count()
        }
        require(c1 == c2, s"segmentation changed chunking: $c1 vs $c2")
        println(s"""{"mode":"cdc","assets":$nAssets,""" +
          s""""chars_per_asset":$charsPer,"chunks":$c1,""" +
          s""""seg4096_sec":$tSeg,"whole_asset_sec":$tWhole}""")

      case "semdedup" =>
        // SemDeDup at vector scale: clusters bound the pair scan, so cost
        // tracks Σ|cell|² — probe with n/20 injected ×2-scaled clones
        // (structurally guaranteed to share their original's cell) and a
        // √n-ish codebook. Catch rate must be 1.0; extra drops are
        // genuine near-dups of the synthetic fixture, reported not judged.
        graft.functions.VectorFunctions.register(spark)
        val n = if (args.length > 1) args(1).toLong else 200000L
        val base = ScaleProbe.syntheticVectors(spark, n, 64)
          .select(col("id"), col("vector"))
        val clones = base.filter(col("id") % 20 === 0)
          .select((col("id") + 10000000L).as("id"),
            transform(col("vector"), x => x * lit(2.0f)).as("vector"))
        val nodes = base.unionByName(clones).localCheckpoint()
        nodes.count()
        val kCells = math.min(1024, math.max(16,
          math.sqrt(n.toDouble).toInt))
        val cb = operators.IvfIndex.sampleCodebook(nodes, kCells)
          .localCheckpoint()
        cb.count()
        val (dropped, tSem) = timed {
          operators.TextDedup.semanticDedup(nodes, cb, tau = 0.9)
            .filter(!col("keep")).select("id")
            .collect().map(_.getLong(0)).toSet
        }
        val cloneIds = clones.select("id")
          .collect().map(_.getLong(0)).toSet
        val caught = cloneIds.intersect(dropped).size
        println(s"""{"mode":"semdedup","vectors":$n,""" +
          s""""clones":${cloneIds.size},"caught":$caught,""" +
          s""""extra_drops":${(dropped -- cloneIds).size},""" +
          s""""cells":$kCells,"sec":$tSem}""")

      case "dsir" =>
        // DSIR at corpus scale: both model fits are one tokenize pass
        // each (bucket tables ≤ 512 rows, broadcast); the weight attach
        // is map-side; top-k is TakeOrdered. Target docs draw from a
        // 10×-narrower vocabulary so importance weights carry signal.
        val n = if (args.length > 1) args(1).toLong else 1000000L
        val raw = syntheticDocs(spark, n, salt = 6).localCheckpoint()
        val tgtToks = transform(sequence(lit(0), lit(39)),
          j => concat(lit("w"), pmod(hash(col("id") * 11 + 13, j),
            lit(5000))))
        val target = spark.range(n / 100)
          .select(col("id").as("doc_id"),
            concat_ws(" ", tgtToks).as("text")).localCheckpoint()
        raw.count(); target.count()
        val (_, tW) = timed {
          operators.ImportanceResampling
            .importanceWeights(raw, target).count()
        }
        val (topW, tTop) = timed {
          operators.ImportanceResampling
            .resample(raw, target, k = (n / 100).toInt)
            .agg(min(col("logw_micro"))).head().getLong(0)
        }
        println(s"""{"mode":"dsir","raw_docs":$n,""" +
          s""""target_docs":${n / 100},"weights_sec":$tW,""" +
          s""""topk_sec":$tTop,"topk_min_logw_micro":$topW}""")

      case "classify" =>
        // NB classifier at corpus scale: training is two tokenize-and-
        // count aggregations (model = V×C rows), scoring a postings-
        // style term join — walls must track tokens, not docs². Docs
        // get class-biased vocabularies (half the tokens from a
        // class-specific 5 k range, half shared noise) so the model has
        // signal and held-out accuracy is a meaningful health check.
        val n = if (args.length > 1) args(1).toLong else 1000000L
        val classes = 5
        val cls = pmod(hash(col("id") * 31 + 7), lit(classes))
        val toks = transform(sequence(lit(0), lit(39)), j =>
          when(pmod(hash(col("id") * 7 + 17, j), lit(2)) === 0,
            concat(lit("c"), cls, lit("_"),
              pmod(hash(col("id") * 13 + 29, j), lit(5000))))
          .otherwise(
            concat(lit("w"), pmod(hash(col("id") * 7 + 23, j),
              lit(50000)))))
        val docs = spark.range(n).select(col("id").as("doc_id"),
            concat(lit("L"), cls).as("label"),
            concat_ws(" ", toks).as("text"))
          .localCheckpoint()
        docs.count()
        val train = docs.filter(col("doc_id") % 5 =!= 0)
        val held = docs.filter(col("doc_id") % 5 === 0)
        val (model, tTrain) = timed {
          val m = operators.TextClassifier
            .trainNaiveBayes(train, labelCol = "label")
          m.weights.count(); m
        }
        val vc = model.weights.count()
        val mC = model.weights.localCheckpoint()
        val mS = model.classStats.localCheckpoint()
        val frozen = operators.TextClassifier.NbModel(mC, mS)
        val (acc, tScore) = timed {
          val pred = operators.TextClassifier.classify(held, frozen)
          val hits = pred.join(held.select(col("doc_id"),
              col("label").as("truth")), Seq("doc_id"))
            .agg(sum(when(col("label") === col("truth"), 1L)
              .otherwise(0L)).as("ok"), count(lit(1)).as("tot")).head()
          hits.getLong(0).toDouble / hits.getLong(1)
        }
        println(s"""{"mode":"classify","docs":$n,"classes":$classes,""" +
          s""""model_rows":$vc,"train_sec":$tTrain,""" +
          s""""score_sec":$tScore,"heldout_acc":$acc}""")

      case other =>
        throw new IllegalArgumentException(s"unknown mode $other")
    }
    spark.stop()
  }
}
