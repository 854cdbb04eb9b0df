package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IndexParams, TextFeaturizer}

/** The composed 1 M-document flagship run — the end-to-end pipeline a
  * user evaluating this engine actually reproduces, in ONE process:
  *
  *   raw docs → [[CorpusStore.assemble]] (every stage: clean, gate,
  *   source cap, exact + MinHash near-dup, semantic dedup,
  *   decontamination, DSIR, mixture resample, split, pack)
  *   → embed ([[operators.TextFeaturizer.featureHash]])
  *   → [[VectorStore.buildPqIndex]] (sample-bounded training)
  *   → serving ([[VectorStore.searchAuto]] dispatch + the explicit
  *     [[VectorStore.searchPq]] compressed arm)
  *
  * Reports per-phase walls, the kept-doc/manifest cross-check, the
  * dispatcher's chosen arm and serving walls — the SCALING.md flagship
  * section is this probe's output verbatim.
  *
  * Usage: `sbt "runMain graft.FlagshipProbe 1000000"`.
  */
object FlagshipProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val partitions = math.max(cpus.toInt, (n / 20000L).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // `preassign` mode: the semantic pre-assign phase in isolation, flat
    // n×k vs two-level ~2n√k ([[operators.IvfIndex.assignHierarchical]]),
    // plus cell agreement — the measured basis for the flagship's
    // hierarchical pre-assign at large n (the 6 M rung's n^1.5 term).
    if (args.length > 1 && args(1) == "preassign") {
      val semK = math.max(64, math.sqrt(n.toDouble).toInt)
      val emb = spark.range(n).select(col("id"),
          transform(sequence(lit(0), lit(31)),
            j => ((pmod(hash(col("id"), j), lit(1000)).cast("float") /
              lit(1000.0f)) + lit(0.05f)).cast("float")).as("vector"))
        .localCheckpoint()
      emb.count()
      val cb = graft.operators.IvfIndex.sampleCodebook(emb, semK)
        .localCheckpoint()
      def run(f: => org.apache.spark.sql.DataFrame) = timed {
        f.select(col("id"), col("cell")).localCheckpoint()
      }
      val (flat, tFlat) = run(graft.operators.IvfIndex.assign(emb, cb))
      val (hier, tHier) = run(
        graft.operators.IvfIndex.assignHierarchical(emb, cb))
      val agree = flat.join(hier, Seq("id", "cell"), "left_semi").count()
        .toDouble / n
      println(s"""{"mode":"preassign","n":$n,"k":$semK,""" +
        s""""flat_sec":$tFlat,"hier_sec":$tHier,"agreement":$agree}""")
      spark.stop()
      return
    }

    // ---- phase 0: raw corpus + assembly side inputs -------------------
    val docs = TextScaleProbe.syntheticDocs(spark, n, salt = 4)
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
      .localCheckpoint()
    val semEmb = spark.range(n).select(col("id").as("doc_id"),
        transform(sequence(lit(0), lit(31)),
          j => ((pmod(hash(col("id"), j), lit(1000)).cast("float") /
            lit(1000.0f)) + lit(0.05f)).cast("float")).as("vector"))
      .localCheckpoint()
    val bench = TextScaleProbe.syntheticDocs(spark, 2000L, salt = 9)
      .localCheckpoint()
    val target = TextScaleProbe.syntheticDocs(spark, 20000L, salt = 4)
      .filter(col("doc_id") % 7 === 0).localCheckpoint()
    docs.count(); semEmb.count(); bench.count(); target.count()

    // ---- phase 1: corpus assembly (all stages) ------------------------
    val corpus = CorpusStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-flagship-corpus"))
    val (_, tPut) = timed { corpus.putDocuments(docs) }
    val semK = math.max(64, math.sqrt(n.toDouble).toInt)
    // pre-assigned semantic cells: the persisted-IVF-artifact lever
    // (TextScaleProbe `sempre` — measured 90.5 → 66.0 s at 1 M). Past
    // k = 256 the flat n×k scan is an n^1.5 term (833.9 s at 6 M) —
    // two-level assignment is the measured fix (22.7 s; see the
    // `preassign` mode + SCALING.md 6 M rung).
    val (semPre, tPreAssign) = timed {
      val embIds = semEmb.select(col("doc_id").as("id"), col("vector"))
      val cb = graft.operators.IvfIndex.sampleCodebook(embIds, semK)
      val asg = (if (semK > 256)
          graft.operators.IvfIndex.assignHierarchical(embIds, cb)
        else graft.operators.IvfIndex.assign(embIds, cb))
        .select(col("id"), col("cell")).localCheckpoint()
      asg.count(); asg
    }
    val (_, tAssemble) = timed {
      corpus.assemble(CorpusStore.AssemblyParams(
        minTokens = 5, minQuality = 0.1,
        maxPerSource = (n / 25).toInt,
        nearDupJaccard = 0.9, nHashes = 8,
        benchmark = Some(bench), maxSharedNgrams = 10,
        embeddings = Some(semEmb), semanticTau = 0.95, semanticK = semK,
        semanticAssignments = Some(semPre),
        dsirTarget = Some(target), dsirK = (n / 4).toInt,
        targets = Map("src1" -> 3L, "src2" -> 1L, "src3" -> 2L),
        seqTokens = 2048))
    }
    val kept = corpus.trainingDocs.count()
    val frags = corpus.trainingSequences.count()
    val manifestN = """"n_output_docs":\s*(\d+)""".r
      .findFirstMatchIn(corpus.manifest).map(_.group(1).toLong)
      .getOrElse(-1L)

    // ---- phase 2: embed the assembled corpus --------------------------
    val (emb, tEmbed) = timed {
      val e = TextFeaturizer.featureHash(corpus.trainingDocs, dim)
        .localCheckpoint()
      e.count(); e
    }

    // ---- phase 3: vector store + compressed index ---------------------
    val store = VectorStore.openOrCreate(spark,
      graft.util.Fs.tempDirDeletedOnExit("graft-flagship-store"),
      IndexParams(dim = dim))
    val (_, tLoad) = timed { store.addBatch(emb) }
    val (_, tPqBuild) = timed { store.buildPqIndex() }

    // ---- phase 4: serving ---------------------------------------------
    val qv = emb.limit(20)
      .select(col("id").as("query_id"), col("vector").as("query_vec"))
      .localCheckpoint()
    qv.count()
    val ((strategy, autoRows), tAuto) = timed {
      val (s, r) = store.searchAuto(qv, k = 10, strengthSetting = 0)
      (s, r.count())
    }
    val (pqRows, tPq) = timed(
      store.searchPq(qv, k = 10, strengthSetting = 0).count())

    println(s"""{"mode":"flagship","docs":$n,"dim":$dim,""" +
      s""""put_sec":$tPut,"pre_assign_sec":$tPreAssign,""" +
      s""""assemble_sec":$tAssemble,""" +
      s""""kept_docs":$kept,"fragments":$frags,""" +
      s""""manifest_output_docs":$manifestN,""" +
      s""""manifest_matches":${manifestN == kept},""" +
      s""""embed_sec":$tEmbed,"store_load_sec":$tLoad,""" +
      s""""pq_build_sec":$tPqBuild,""" +
      s""""auto_strategy":"$strategy","auto_sec":$tAuto,""" +
      s""""auto_rows":$autoRows,"pq_sec":$tPq,"pq_rows":$pqRows}""")
    spark.stop()
  }
}
