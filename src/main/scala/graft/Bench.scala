package graft

import org.apache.spark.sql.DataFrame

import graft.operators.PlayStore
import graft.sources.IO

/** Benchmark main — runs the headline queries (the ones BASELINE.md prices)
  * plus the LLM-pipeline operators on SPARK_GRAFT_SF_DIR and prints ONE JSON
  * line. A failed query is reported as an explicit error entry (and excluded
  * from the total) rather than a fake timing.
  *
  * Timing methodology (mirrors how BASELINE.md was measured): a warm
  * session — one untimed warm-up action first so JVM/codegen/file-index
  * costs don't land on whichever query happens to run first — and Part 5
  * timed from a pre-materialized df_4 (the baseline's Part-5 number reads
  * the already-written parquet, it does not recompute Parts 1-4).
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- warm-up (untimed) ----
    run(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    // the other canary-basket members too: probe 0 must measure machine
    // state, not their first-run JIT
    run(SparkEntry.queries("q_join_agg")(spark, sfDir))
    run(SparkEntry.queries("w1_row_number_topk")(spark, sfDir))
    PlayStore.readStore(spark).count()
    // pre-materialize df_4 for the Part-5 measurement
    val df4Dir = IO.scratchDir("bench_df4")
    val df1 = PlayStore.averageSentimentByApp(PlayStore.readReviews(spark))
    val df3 = PlayStore.standardizePerApp(PlayStore.readStore(spark))
    PlayStore.joinSentiment(spark, df3, df1, df4Dir)
    // prime the stored artifacts the incremental/serve-path rows consume
    // (corpus cluster state, train band index) so those rows time the
    // SERVE cost — the one-time corpus build is a scheduled job in
    // production, not part of the per-batch / per-eval-suite query
    run(SparkEntry.queries("dedup_incremental_components")(spark, sfDir))
    run(SparkEntry.queries("decontam_neardup_stored")(spark, sfDir))
    run(SparkEntry.queries("dedup_incremental_winnow")(spark, sfDir))
    run(SparkEntry.queries("dedup_winnow_pairs")(spark, sfDir))
    run(SparkEntry.queries("emb_incremental_neardup")(spark, sfDir))
    run(SparkEntry.queries("snapshot_scd2_incremental")(spark, sfDir))
    run(SparkEntry.queries("events_retention_incremental")(spark, sfDir))
    run(SparkEntry.queries("dedup_jaccard_stored")(spark, sfDir))
    run(SparkEntry.queries("mm_incremental_stored")(spark, sfDir))
    run(SparkEntry.queries("mm_decontam_stored")(spark, sfDir))
    run(SparkEntry.queries("mm_curation_stored")(spark, sfDir))
    run(SparkEntry.queries("mm_ingest_stored")(spark, sfDir))
    run(SparkEntry.queries("graph_condensation")(spark, sfDir))

    // ---- timed cases ----
    val fromRegistry = Seq(
      "q1_pricing_summary", "q_join_agg", "q_star_join",
      "o1_sort_desc_string", "w1_row_number_topk", "skew_salted_agg",
      "sess_batch", "ps_part2_best_apps", "ps_part3_standardize",
      "dedup_exact", "dedup_minhash_pairs", "dedup_simhash_pairs",
      "ann_topk_bruteforce", "ann_topk_native", "ann_topk_lsh", "ann_topk_ivf",
      "emb_near_dup_pairs", "txt_token_counts", "txt_fingerprints",
      "txt_tfidf_top_terms", "mm_features_fix", "mm_face_segments",
      "mm_neardup_pairs", "mm_dedup_decision", "mm_incremental_neardup",
      "mm_neardup_pairs_fast", "mm_dedup_decision_fast", "sketch_merge_exact",
      "mm_fingerprint", "mm_content_neardup", "mm_content_decision",
      "mm_incremental_stored", "mm_decontam", "mm_decontam_stored",
      "mm_quality_rules",
      "mm_curation_decisions", "mm_curation_stored",
      "mm_ingest_decisions", "mm_ingest_stored",
      "j6_range_join", "corpus_pack_sequences", "corpus_train_val_split",
      "w4_rank_topk", "corpus_chunk", "txt_scrub",
      "dedup_cluster_decision",
      "txt_vocab", "dedup_fuzzy_lev", "emb_centroids", "corpus_curated",
      "snapshot_diff", "upsert_latest", "dedup_semantic", "emb_project",
      "ann_topk_pq", "pq_codes", "ann_topk_ivfpq", "corpus_quality_quantile",
      "w6_range_frame", "txt_unigram_logprob", "corpus_decontam_bloom",
      "dedup_substring_pairs", "ann_topk_ivfpq_res", "corpus_curate_pack",
      "corpus_pack_nosplit", "dedup_incremental_minhash",
      "dedup_incremental_components", "mm_dims", "mm_extent",
      "mm_content_dedup",
      "corpus_split_leakage_safe", "txt_bigram_logprob",
      "corpus_ingest_decisions", "corpus_ingest_rebuild",
      "dedup_cluster_decision_rebuild", "corpus_split_leakage_rebuild",
      "ann_topk_mrl", "txt_gopher_rules", "txt_pii_report",
      "corpus_temp_mixture", "dedup_cluster_sizes",
      "quality_lr_scores", "retrieval_bm25_topk", "retrieval_bm25_stored",
      "dsir_weights",
      "dsir_sample", "graph_pagerank", "txt_perplexity_buckets",
      "corpus_source_overlap",
      "graph_pagerank_rebuild", "graph_pagerank_joinloop",
      "graph_hits", "graph_hits_joinloop", "graph_ppr_joinloop",
      "retrieval_hard_negatives",
      "retrieval_hybrid_rrf", "decontam_containment", "decontam_neardup",
      "decontam_neardup_stored", "decontam_gate",
      "dedup_source_attribution", "corpus_padding_waste",
      "corpus_span_corruption", "corpus_fim_manifest", "corpus_denoiser_mix",
      "txt_kn_logprob", "corpus_budget_mix", "emb_outlier_report",
      "graph_ppr", "graph_random_walks",
      "graph_label_prop", "graph_label_prop_joinloop", "graph_label_prop_sizes",
      "txt_winnow", "dedup_winnow_pairs", "emb_semantic_prune",
      "dedup_winnow_components", "emb_incremental_neardup",
      "dedup_exact_normalized", "corpus_shard_manifest",
      "emb_pca_component", "emb_pca_project", "emb_knn_graph",
      "graph_triangles", "graph_clustering_coeff", "dedup_jaccard_prefix",
      "sketch_heavy_hitters", "snapshot_scd2", "txt_pmi_collocations",
      "emb_knn_refine", "w8_distribution_ranks", "decontam_semantic",
      "events_assoc_lift", "graph_label_prop_modularity",
      "snapshot_scd2_incremental", "hilbert_values", "txt_source_kl", "txt_source_zipf",
      "graph_kcore", "graph_bfs_distances",
      "dedup_incremental_winnow", "dedup_winnow_pairs_rebuild",
      "txt_normalize",
      "snapshot_scd2_asof", "events_retention", "events_cohort_volume",
      "sketch_heavy_hitters_wide",
      "ann_recall_report", "graph_walk_skipgrams", "dq_report",
      "events_preference_pairs", "events_retention_incremental",
      "graph_widest_path", "quality_calibration", "dedup_jaccard_stored",
      "txt_tokenizer_fertility", "dedup_minhash_eval",
      "txt_langid_confusion", "events_bt_ratings",
      "corpus_boilerplate_report", "corpus_boilerplate_scrub",
      "sketch_hll_intersect", "sketch_intersect_exact",
      "emb_cluster_terms", "emb_margin_pairs", "emb_margin_pairs_ivf",
      "emb_margin_pairs_ivf_capped",
      "corpus_weighted_sample", "events_trending",
      "events_trending_incremental", "emb_training_triplets",
      "graph_scc", "graph_condensation", "graph_neighborhood",
      "graph_scc_profile", "dedup_lsh_design",
      "quality_auc", "quality_pr_table", "quality_ece",
      "events_ab_test", "events_cusum",
      "txt_readability", "retrieval_phrase",
      // r19: the registry's LLM-family rows that never had a bench trend
      // line (the r18 VERDICT gap) — curated to the rows a pipeline
      // operator would actually watch, not the sub-second relational pins.
      // Raw TOTALS are not comparable r18→r19 (30 more rows); adjudicate
      // via queries_norm per-row or the r18-set subtotal (SCALING.md r19).
      "corpus_line_dedup", "corpus_shuffle_order", "corpus_stratified_sample",
      "corpus_cap_per_source", "corpus_stats",
      "dedup_substring_components", "dedup_incremental_exact",
      "dedup_incremental_simhash", "dedup_ngram_jaccard",
      "dedup_cluster_keep_best",
      "ann_topk_ivf_stored", "ann_topk_binary", "ann_topk_quantized",
      "kmeans_codebook", "txt_bpe_merges", "txt_bpe_segment",
      "txt_lang_id", "txt_quality", "txt_repetition",
      "dsir_logratios", "quality_lr_weights",
      "sketch_cms_counts", "sketch_quantile_values",
      "skew_salted_join", "exact_median", "zorder_values",
      "graph_transition_edges", "events_funnel",
      "mm_fingerprint_fast", "mm_frames")
    val allCases: Seq[(String, () => DataFrame)] =
      fromRegistry.map(n => n -> (() => SparkEntry.queries(n)(spark, sfDir))) :+
        ("ps_part5_metrics" -> (() => PlayStore.metricsByGenre(
          spark, IO.readParquet(spark, df4Dir), IO.scratchDir("bench_ps5"))))
    // Dev loop escape hatch: SPARK_GRAFT_BENCH_ONLY=a,b,c times just those
    // queries. The driver never sets it, so the per-round number always
    // covers the full list.
    val cases = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(only) =>
        val keep = only.split(",").map(_.trim).toSet
        allCases.filter(c => keep(c._1))
      case None => allCases
    }

    // star-contraction convergence telemetry: queries that run connected
    // components report (rounds, final contracted edges) so round-count
    // regressions are visible in the bench payload without GRAFT_CC_DEBUG
    val ccStats = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Long)]
    // contraction action telemetry (r20): driver roundtrips per cc run,
    // the currency of the loop-fusion claim (one action per round)
    val ccActions = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    // pagerank build/loop split: rebuild rows report how much of their
    // wall is edge construction vs power iteration
    val prStats = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    // scc convergence telemetry: FW-BW sweep count per scc row, plus
    // the Spark-action count (the driver-roundtrip currency of the
    // loop floor) so sweeps and their per-sweep cost read together
    val sccStats = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val sccActs = scala.collection.mutable.LinkedHashMap.empty[String, Int]

    // best-of-2: a single local-mode run still carries JIT/IO noise that a
    // second pass removes; min is the steady-state number the 2x gate means
    def timeCase(name: String, mk: () => DataFrame): (String, Either[String, Double]) = {
        def once(): Either[String, Double] = {
          // start each timing from a cache-free session so no query's
          // number depends on what ran before it (r3's minhash swing was
          // cache-state accumulation across the 21-query session).
          // clearCache drops CacheManager entries. localCheckpoint RDDs
          // live OUTSIDE the catalog cache (they register as persistent
          // RDDs) and System.gc + async ContextCleaner reclaimed them too
          // slowly at 78 queries × 2 runs — block-store pressure aged the
          // session until late-list rows ran 2-6× their solo numbers
          // (r7's dedup_substring_pairs 3.9 s vs 1.6 s solo). A BLOCKING
          // unpersist of every leftover persistent RDD makes the teardown
          // deterministic; the gc then only has ordinary garbage left.
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
          val t0 = System.nanoTime()
          try {
            run(mk())
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable => Left(e.getClass.getSimpleName)
          }
        }
        operators.Cluster.lastRunStats = None
        operators.Cluster.lastRunActions = None
        operators.LinkGraph.lastBuildStats = None
        operators.LinkGraph.lastSccSweeps = None
        operators.LinkGraph.lastSccActions = None
        val r = (once(), once()) match {
          case (Right(a), Right(b)) => Right(math.min(a, b))
          case (Right(a), _) => Right(a)
          case (_, Right(b)) => Right(b)
          case (l, _) => l
        }
        operators.Cluster.lastRunStats.foreach(ccStats(name) = _)
        operators.Cluster.lastRunActions.foreach(ccActions(name) = _)
        operators.LinkGraph.lastBuildStats.foreach(prStats(name) = _)
        operators.LinkGraph.lastSccSweeps.foreach(sccStats(name) = _)
        operators.LinkGraph.lastSccActions.foreach(sccActs(name) = _)
        name -> r
    }

    // DRIFT CANARIES, interleaved + basketed: a fixed three-query BASKET
    // re-timed BEFORE the run and after every `CanaryEvery` timed cases
    // (each member the identical best-of-2 protocol; probe value = the
    // basket sum). Two lessons priced into this shape:
    //  - r16 (start/mid/end triple): three samples cannot represent a
    //    178-row run — two same-code runs normalized 25% apart. Fix:
    //    ~10 interleaved probes, each row normalized by its own
    //    NEIGHBORHOOD (mean of the two bracketing probes).
    //  - r17 close (single-query probes): one ~0.6 s query AMPLIFIES
    //    real within-run drift — back-to-back runs measured an ~8%
    //    first-half drift (per-row medians) that q1-alone reported as
    //    18%, pushing normalized totals 17% apart while raw totals
    //    agreed to 1%. A basket of three heterogeneous shapes (scan+agg,
    //    join+agg, window top-k) tracks the drift without one query's
    //    JIT/GC idiosyncrasy setting the amplitude.
    // The digest reports the probe MEDIAN — robust to a single outlier
    // probe where a mean is not.
    val CanaryEvery = 20
    val CanaryBasket = Seq("q1_pricing_summary", "q_join_agg", "w1_row_number_topk")
    // per-MEMBER timings kept separate until the digest: summing inside
    // the probe would let ONE flaky basket member turn the whole probe
    // NaN and discard the two healthy members' drift signal (up to 40
    // rows falling back to the run median) — the r17 ADVICE finding.
    def canary(): Seq[Double] =
      CanaryBasket.map(n =>
        timeCase(n, () => SparkEntry.queries(n)(spark, sfDir))
          ._2.getOrElse(Double.NaN))
    val probesRaw = scala.collection.mutable.ArrayBuffer[Seq[Double]]()
    val resultsBuf =
      scala.collection.mutable.ArrayBuffer[(String, Either[String, Double])]()
    probesRaw += canary()
    cases.grouped(CanaryEvery).foreach { grp =>
      grp.foreach { case (n, mk) => resultsBuf += timeCase(n, mk) }
      probesRaw += canary()
    }
    // Salvage partial probes while keeping probe values COMPARABLE
    // within the run (a 2-member sum next to 3-member sums would skew
    // the neighborhood normalization): a failed member substitutes its
    // own median across the run's other probes; a member that never
    // succeeded drops from every probe (consistent basket).
    val memberMed: Seq[Double] = CanaryBasket.indices.map { j =>
      val xs = probesRaw.map(_(j)).filterNot(_.isNaN).sorted
      if (xs.isEmpty) Double.NaN else xs(xs.length / 2)
    }
    val keepMembers = CanaryBasket.indices.filterNot(j => memberMed(j).isNaN)
    val probes = probesRaw.map { p =>
      if (keepMembers.isEmpty) Double.NaN
      else keepMembers.map(j => if (p(j).isNaN) memberMed(j) else p(j)).sum
    }
    val results: Seq[(String, Either[String, Double])] = resultsBuf.toSeq
    def ms(d: Double): Double = math.round(d * 1000) / 1000.0
    // NaN-safe JSON: a failed probe (or an all-failed run) must emit
    // null, never a plausible-looking 0.0 — math.round(NaN) is 0 and a
    // silent zero would poison round-over-round normalization (the last
    // open r15 ADVICE item).
    def msJ(d: Double): String = if (d.isNaN) "null" else ms(d).toString
    val driftJ = probes.map(msJ).mkString(
      s"""{"every":$CanaryEvery,"probes":[""", ",", "]}")
    // the headline drift statistic: median of the probes (outlier-robust)
    val driftMean = {
      val xs = probes.filterNot(_.isNaN).sorted
      if (xs.isEmpty) Double.NaN else xs(xs.length / 2)
    }
    // CANARY-NORMALIZED ratios: each row divided by the mean of its two
    // bracketing probes (falling back to the run median when a probe
    // failed), so round-over-round diffs self-adjudicate — comparing two
    // rounds' normalized values cancels whole-machine drift at the
    // granularity it actually varies (within-run, not just run-to-run).
    def rowCanary(i: Int): Double = {
      val g = i / CanaryEvery
      val near = Seq(probes(g), probes(g + 1)).filterNot(_.isNaN)
      if (near.nonEmpty) near.sum / near.length else driftMean
    }
    val qsNorm =
      if (driftMean.isNaN || driftMean <= 0) "{}"
      else results.zipWithIndex.collect { case ((k, Right(sec)), i) =>
        s""""$k":${math.round(sec / rowCanary(i) * 1000) / 1000.0}"""
      }.mkString("{", ",", "}")

    val qs = results.map {
      case (k, Right(sec)) => s""""$k":$sec"""
      case (k, Left(err)) => s""""$k":"ERROR:$err""""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, Right(s)) => s }.sum
    val errors = results.count(_._2.isLeft)
    val cc = ccStats
      .map { case (k, (r, e)) => s""""$k":{"cc_rounds":$r,"cc_edges":$e}""" }
      .mkString("{", ",", "}")
    val ccActsJ = ccActions.map { case (k, n) => s""""$k":$n""" }
      .mkString("{", ",", "}")
    val pr = prStats
      .map { case (k, (b, l)) =>
        s""""$k":{"build_sec":${math.round(b * 1000) / 1000.0},"loop_sec":${math.round(l * 1000) / 1000.0}}""" }
      .mkString("{", ",", "}")
    val sccJ = sccStats.map { case (k, n) => s""""$k":$n""" }
      .mkString("{", ",", "}")
    val sccA = sccActs.map { case (k, n) => s""""$k":$n""" }
      .mkString("{", ",", "}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","cpus":$cpus,"queries":$qs,"errors":$errors,"cc":$cc,"cc_actions":$ccActsJ,"pr_split":$pr,"scc_sweeps":$sccJ,"scc_actions":$sccA,"drift":$driftJ,"drift_mean":${msJ(driftMean)},"queries_norm":$qsNorm,"sf":"$sfDir"}"""
    // The COMPLETE payload goes to a file: the harness keeps only the last
    // ~2000 chars of output, and the full per-query map (~3 KB at 78
    // queries) cannot fit — BENCH_r07's committed artifact lost its head
    // exactly this way ("parsed": null, the error rows invisible).
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), full)
    // Multi-run sessions used to DESTROY the per-query record: the
    // driver benches twice (32-core, then 8-core for the scaling block)
    // and the second run overwrote bench_full.json — r19's only
    // surviving 32-core per-query record was the printed digest's 32-row
    // subset (the r19 verdict's watch-item #2). Two additive fixes, no
    // removal: a per-core-count full payload (latest run at THAT width
    // survives any later run at another width) and an append-only
    // journal holding every invocation in order.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"bench_full_c$cpus.json"), full)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_runs.jsonl"), full + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    // The PRINTED line is a compact digest sized to survive the tail
    // window whole: headline total, error count AND NAMES (a regression
    // must never vanish from the captured artifact), and the
    // baseline-gated + verdict-tracked subset at ms precision. The full
    // map lives in bench_full.json next to this repo's build.
    val headline = Seq(
      "q1_pricing_summary", "q_join_agg", "q_star_join",
      "ps_part2_best_apps", "ps_part3_standardize", "ps_part5_metrics",
      "sess_batch", "upsert_latest", "w6_range_frame", "j6_range_join",
      "dedup_cluster_decision", "dedup_cluster_decision_rebuild",
      "corpus_split_leakage_safe", "corpus_split_leakage_rebuild",
      "dedup_substring_pairs", "dedup_semantic", "dedup_fuzzy_lev",
      "dedup_incremental_minhash", "ann_topk_pq", "ann_topk_ivfpq_res",
      "pq_codes", "snapshot_diff", "txt_unigram_logprob",
      "corpus_decontam_bloom", "retrieval_bm25_topk",
      "retrieval_bm25_stored", "graph_pagerank", "graph_pagerank_rebuild",
      "decontam_neardup", "decontam_neardup_stored", "decontam_gate",
      "dedup_incremental_components",
      // r20 additions (additions-only): the rows this round's
      // optimizations touch plus the biggest remaining board rows, so
      // the driver can adjudicate them from the PRINTED line (the full
      // map lives in bench_full_c<cpus>.json / bench_runs.jsonl — the
      // one-line JSON cannot hold all ~215 rows inside the harness's
      // 2000-char tail window; the digest is sized to survive it whole)
      "graph_scc", "dedup_winnow_components", "dedup_cluster_keep_best",
      "mm_dedup_decision", "mm_curation_decisions", "mm_content_decision",
      "txt_winnow", "dedup_minhash_eval", "events_assoc_lift",
      "events_bt_ratings", "ann_recall_report", "emb_knn_refine",
      "mm_fingerprint", "ann_topk_bruteforce", "txt_bpe_segment",
      "dedup_winnow_pairs_rebuild", "dedup_ngram_jaccard",
      "dedup_substring_components")
    val byName = results.toMap
    val qsCompact = headline.flatMap(k => byName.get(k).map {
      case Right(sec) => s""""$k":${math.round(sec * 1000) / 1000.0}"""
      case Left(err) => s""""$k":"ERROR:$err""""
    }).mkString("{", ",", "}")
    val errNames = results.collect { case (k, Left(_)) => s""""$k"""" }
      .mkString("[", ",", "]")
    // stop the session BEFORE printing: Spark's shutdown logging otherwise
    // lands after the JSON line and any tail-line parser reads noise
    // instead of the payload (BENCH_r3..r6 all parsed to null this way)
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsCompact,"errors":$errors,"err_names":$errNames,"drift":$driftJ,"drift_mean":${msJ(driftMean)},"full":"bench_full.json","sf":"$sfDir"}""")
  }
}
