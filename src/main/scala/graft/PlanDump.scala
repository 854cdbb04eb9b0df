package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: dump the executed physical plans of the flagship queries to
  * PLANS.md — reviewable evidence that the scale properties asserted by
  * PlanSpec (pushdown, broadcasts, WindowGroupLimit, codegen stages) hold
  * in the actual plans. Usage: `sbt "runMain graft.PlanDump"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val picks = Seq(
      "q01_pricing_summary" -> "scan→filter→partial/final agg; pushdown + pruning",
      "q02_filter_project" -> "predicate + projection pushdown to parquet",
      "q04_customers_per_region" -> "broadcast dimension joins",
      "q05_top_orders_per_customer" -> "WindowGroupLimit partial+final top-k",
      "v01_knn_exact" -> "broadcast query set; codegen'd cosine kernel; threshold inside join; window group-limit",
      "v12_topk_aggregate" -> "bounded-heap TypedImperativeAggregate partial+final",
      "d03_minhash_lsh_pairs" -> "fingerprint collapse → band join → size-pruned verify",
      "a01_ann_lsh_search" -> "exploded multi-band bucket join prefilter",
      "a08_ann_euclidean" -> "p-stable (E2LSH) integer-cell bucket join for the euclidean metric",
      "v11_knn_graph" -> "neighbor selection over LSH-bucketed candidates — no all-pairs join",
      "d06_embedding_neardup" -> "near-dup pair blocking through anchored-LSH buckets — no cartesian",
      "d09_duplicated_spans" -> "positional spans via posexplode+lead; one uniform-hash shuffle",
      "a10_pq_adc_search" -> "PQ ADC: broadcast codebooks/LUT, packed codes, codegen lookup-sum kernel",
      "a12_ivf_pq_search" -> "IVF-PQ: broadcast cell probe narrows candidates, ADC scores codes only",
      "a14_ivfpq_residual" -> "residual IVF-PQ: per-(query,cell) LUTs over residual codebooks, gated broadcasts",
      "a15_sq8_search" -> "SQ8: broadcast dim bounds + query codes, packed int codes, codegen exact-integer L2 kernel",
      "a16_bq_hamming" -> "binary quantization: bit_or word packing, codegen popcount-XOR Hamming kernel",
      "t14_unigram_loglik" -> "unigram log-lik: vocab-sized agg, broadcast stats, term-keyed logp attach, BIGINT-exact means",
      "t09_bm25_search" -> "BM25 = inverted-index equi-join on term; broadcast corpus stats; df-ceiling prune before the candidate join",
      "a13_anchored_merge" -> "incremental merge: broadcast delta membership + capped bucket candidates; untouched adjacency passes through behind broadcast anti-joins",
      "t12_source_caps" -> "per-source quota: salted-hash rank as partial WindowGroupLimit — hot domains prune map-side",
      "q24_asof_join" -> "as-of join = one keyed shuffle + window, NO join node",
      "q25_range_join" -> "banded interval join = bucketed equi hash join, no BNLJ",
      "q30_bucketed_join" -> "bucketed tables: SMJ with zero Exchange below it",
      "q34_bloom_prune_join" -> "bloom membership filter on the fact side BEFORE the join shuffle",
      "t15_seq_packing" -> "sequence packing: two-level prefix sum — range partition, parallel local cumsum, tiny offset window, broadcast offsets back",
      "t16_mixture_resample" -> "mixture resample: ONE broadcast rate join + salted-hash predicate, no corpus shuffle",
      "e02_random_projection" -> "JL projection: map-side codegen dot products against literal planes, zero shuffle",
      "e03_jl_search_rerank" -> "JL search: projected-space shortlist (broadcast queries, WindowGroupLimit) + exact raw-space re-rank touching survivors only",
      "t23_pretokenize" -> "BPE pre-tokenization: regex segmentation inside whole-stage codegen, one narrow map-side pass",
      "e04_rag_chunk_search" -> "composed RAG pipeline: map-side chunk explode, two hash-agg embeds, broadcast cosine top-k",
      "t25_negative_sampling" -> "hashed-rendezvous negatives: ONE bucket equi-join + map-side min_by, never a cross join",
      "q43_asof_forward" -> "forward as-of with tolerance: same single-shuffle window shape as q24, tolerance as a post-mask",
      "a18_seeded_graph_search" -> "LSH-seeded graph hybrid: bucket-join seeds, two bounded frontier expansions, no routed walk",
      "d14_semantic_dedup" -> "SemDeDup: broadcast-argmax cluster assignment, per-cell pair self-join (never all-pairs), left-join keep flags",
      "t26_dsir_resample" -> "DSIR: broadcast <=512-row model tables, map-side weight attach, doc-keyed hash-agg, TakeOrdered top-k",
      "m04_cdc_chunks" -> "CDC: segmented byte-window scan, narrow (asset,end) shuffle, payload joined back once per asset",
      "t27_length_buckets" -> "length buckets: length-cardinality agg + tiny running-sum window + broadcast join back — no corpus-wide ntile",
      "t28_epoch_order" -> "epoch order: per-source hash-rank window + broadcast source-index join, no global window",
      "t29_bpe_train" -> "BPE training: word-TYPE table aggs (vocab-sized), per-step literal replace projections, driver argmax of ONE row per merge",
      "t30_bpe_segment" -> "BPE segmentation: 8 chained literal replaces inside one codegen stage, zero shuffle before the per-doc agg",
      "e06_chunk_store_search" -> "chunk store serving: persisted chunk+vector generation scanned once, broadcast query embed, WindowGroupLimit top-k, Qxk metadata join-back",
      "a19_ivf_seeded_search" -> "IVF-seeded hybrid: broadcast coarse probe bounds seeding at O(Q*nProbe*n/cells), then the two bounded expansions",
      "q44_zorder" -> "z-order kernel: 1-row stats broadcast + pure map-side shift/mask interleave, zero extra shuffle",
      "t31_heavy_hitters" -> "two-pass Misra-Gries: O(k)-state candidate partials, broadcast semi-join recount - never a full-vocab shuffle",
      "e07_hard_negatives" -> "hard-negative band: one codegen filter over the shared search contract, mining cost IS the search cost",
      "q45_funnel" -> "windowed funnel: three per-type hash aggs + user-keyed joins, no event-stream window or state machine",
      "d15_split_leakage" -> "leakage audit: ONE banded pair derivation + two broadcast split attaches, never all-pairs",
      "d16_prefix_jaccard_join" -> "exact PPJoin: rare-shingle prefix equi-join + length prune, verify touches candidate pairs only",
      "a20_pq_append_encode" -> "compressed append: frozen broadcast centroids/codebooks, map-side assign+residual+argmin encode on BOTH base and delta, union of narrow code rows",
      "m05_cdc_gear" -> "Gear CDC: one mapPartitions boundary scan emitting narrow (asset,end) rows, shared declarative chunk/sharing tail",
      "t32_assemble_exact_dedup" -> "assemble exact-dedup mode: persisted generation scanned once (the whole PPJoin+CC chain ran at build, not per query)")

    val sb = new StringBuilder
    sb.append("# PLANS — executed physical plans of flagship queries\n\n")
    sb.append(s"Generated by `graft.PlanDump` against `$sfDir` (AQE-final\n")
    sb.append("plans — an action ran first). `*(n)` prefixes mark\n")
    sb.append("whole-stage-codegen stages. See PlanSpec for the pinned\n")
    sb.append("assertions and SCALING.md for the analysis.\n")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE on THIS plan
      sb.append(s"\n## $name — $note\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.trim)
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
