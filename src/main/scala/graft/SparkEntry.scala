package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
  * registered here as a named query `(SparkSession, sfDir) => DataFrame`,
  * with a DuckDB-equivalent oracle SQL where SQL-expressible. Column names
  * are aliased identically on both sides (the driver compare sorts columns
  * by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    etl.Transform.topkEnriched(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_topk_enriched"    -> (etl.Transform.topkEnriched _),
    "q02_pricing_summary"  -> (etl.Transform.pricingSummary _),
    "q03_left_join"        -> (etl.Transform.leftJoin _),
    "q04_sanitize_cast"    -> (etl.Transform.sanitizeCast _),
    "q05_string_funcs"     -> (etl.Transform.stringFuncs _),
    "q06_entity_dedup"     -> (etl.Normalize.entityNames _),
    "q07_surrogate_ids"    -> (etl.Normalize.surrogateIds _),
    "q08_edges_normalize"  -> (etl.Normalize.edges _),
    "q09_semi_join"        -> (etl.Upsert.semiJoin _),
    "q10_anti_join_insert" -> (etl.Upsert.antiJoinInsert _),
    "q11_merge_upsert"     -> (etl.Upsert.mergeUpsert _),
    "q12_window_rank"      -> (analytics.Relational.windowRank _),
    "q13_rollup_agg"       -> (analytics.Relational.rollupAgg _),
    "q14_setops"           -> (analytics.Relational.setOps _),
    "q15_json_extract"     -> (ops.Events.jsonExtract _),
    "q16_tumbling_window"  -> (ops.Events.tumbling _),
    "q17_sliding_window"   -> (ops.Events.sliding _),
    "q18_sessionize"       -> (ops.Events.sessionize _),
    "q19_asof_join"        -> (ops.TemporalJoins.asofJoin _),
    "q20_range_join"       -> (ops.TemporalJoins.rangeJoin _),
    "q21_dedup_exact"      -> (ops.Dedup.exact _),
    "q22_jaccard_neardup"  -> ((s, d) => ops.Dedup.jaccardNearDup(s, d)),
    "q23_minhash_lsh"      -> ((s, d) => ops.Dedup.minhashLsh(s, d)),
    "q24_simhash_neardup"  -> ((s, d) => ops.Dedup.simhashNearDup(s, d)),
    "q25_cosine_topk"      -> ((s, d) => ops.Similarity.cosineTopK(s, d)),
    "q26_ann_ivf"          -> ((s, d) => ops.Similarity.ivfTopK(s, d)),
    "q27_embedding_neardup" -> ((s, d) => ops.Similarity.embeddingNearDupAuto(s, d)),
    "q28_langid"           -> (ops.TextAnalysis.langId _),
    "q29_quality_score"    -> (ops.TextAnalysis.qualityScore _),
    "q30_token_stats"      -> (ops.TextAnalysis.tokenStats _),
    "q31_fingerprint"      -> (ops.TextAnalysis.fingerprint _),
    "q32_multimodal_meta"  -> (ops.Multimodal.mediaMetaDf _),
    "q33_frame_sample"     -> (ops.Multimodal.frameSample _),
    "q34_stream_tumbling"  -> (streaming.StreamingEvents.tumblingAvailableNow _),
    "q35_html_extract"     -> (etl.Extract.htmlListExtract _),
    "q36_html_details"     -> (etl.Extract.htmlDetailExtract _),
    "q37_csv_roundtrip"    -> (sources.Sinks.csvRoundtrip _),
    "q38_sink_insert_absent" -> (sources.Sinks.insertIfAbsentSink _),
    "q39_merge_timestamped" -> (etl.Upsert.mergeTimestamped _),
    "q40_cube_agg"         -> (analytics.Relational.cubeAgg _),
    "q41_grouping_sets"    -> (analytics.Relational.groupingSetsAgg _),
    "q42_pivot_status"     -> (analytics.Relational.pivotStatus _),
    "q43_percentiles"      -> (analytics.Relational.percentiles _),
    "q44_multi_distinct"   -> (analytics.Relational.multiDistinct _),
    "q45_posexplode_tokens" -> (analytics.Relational.posExplodeTokens _),
    "q46_stateful_sessionize" -> (streaming.StatefulSessions.sessionizeBatch _),
    "q47_stream_sessionize" -> (streaming.StatefulSessions.sessionizeStream _),
    "q48_salted_join"      -> (ops.Skew.saltedJoinAgg _),
    "q49_tfidf"            -> (ops.TextAnalysis.tfidf _),
    "q50_hash_split"       -> (ops.TextAnalysis.hashSplit _),
    "q51_stratified_sample" -> (ops.TextAnalysis.stratifiedSample _),
    "q52_fuzzy_match"      -> (etl.Normalize.fuzzyNameMatch _),
    "q53_map_explode"      -> (ops.Events.mapExplode _),
    "q54_dedup_clusters"   -> (ops.Clusters.dedupClusters _),
    "q55_window_suite"     -> (analytics.Relational.windowSuite _),
    "q56_datetime_funcs"   -> (analytics.Relational.datetimeFuncs _),
    "q57_string_suite"     -> (analytics.Relational.stringSuite _),
    "q58_asof_tolerance"   -> (ops.TemporalJoins.asofJoinTolerance _),
    "q59_constraint_report" -> (etl.Constraints.constraintReport _),
    "q60_text_clean"       -> (ops.TextAnalysis.textClean _),
    "q61_array_funcs"      -> (analytics.Relational.arrayFuncs _),
    "q62_unpivot"          -> (analytics.Relational.unpivotMetrics _),
    "q63_nullsafe_join"    -> (analytics.Relational.nullSafeJoin _),
    "q64_setops_all"       -> (analytics.Relational.setOpsAll _),
    "q65_sql_frontend"     -> (analytics.Relational.sqlFrontend _),
    "q66_right_join"       -> (analytics.Relational.rightJoin _),
    "q67_range_frame"      -> (analytics.Relational.rangeFrame _),
    "q68_numeric_profile"  -> (analytics.Relational.numericProfile _),
    "q69_resample_ffill"   -> (ops.Events.resampleFfill _),
    "q70_funnel"           -> (ops.Events.funnel _),
    "q71_array_agg"        -> (analytics.Relational.arrayAgg _),
    "q72_label_centroids"  -> (ops.Similarity.labelCentroids _),
    "q73_curation_summary" -> (ops.TextAnalysis.curationSummary _),
    "q74_fetch_parse"      -> (sources.FetchSource.fetchParse _),
    "q75_jdbc_roundtrip"   -> (sources.Sinks.jdbcRoundtrip _),
    "q76_ann_lsh"          -> ((s, d) => ops.Similarity.lshTopK(s, d)),
    "q77_media_features"   -> (ops.Multimodal.mediaFeaturesDf _),
    "q78_token_budget_mix" -> (ops.TextAnalysis.tokenBudgetMix _),
    "q79_decontaminate"    -> (ops.TextAnalysis.decontaminate _),
    "q80_repetition"       -> (ops.TextAnalysis.repetitionScore _),
    "q81_heavy_hitters"    -> (ops.TextAnalysis.heavyHitters _),
    "q82_scd2_history"     -> (etl.Upsert.scd2History _),
    "q83_partitioned_sink" -> (sources.Sinks.partitionedSink _),
    "q84_corpus_build_funnel" -> (ops.TextAnalysis.corpusBuildFunnel _),
    "q85_movie_pipeline"   -> (etl.Pipeline.moviePipeline _),
    "q86_stream_join"      -> (streaming.StreamingEvents.clickPurchaseJoin _),
    "q87_pq_ann"           -> ((s, d) => ops.Similarity.pqTopK(s, d)),
    "q88_bloom_decontaminate" -> ((s, d) => ops.Curation.bloomDecontaminate(s, d)),
    "q89_chunk_dedup"      -> ((s, d) => ops.Curation.chunkDedup(s, d)),
    "q90_shard_manifest"   -> ((s, d) => ops.Curation.shardManifest(s, d)),
    "q91_incremental_dedup" -> ((s, d) => ops.Dedup.incrementalDedup(s, d)),
    "q92_stream_dedup"     -> (streaming.StreamingEvents.streamDistinctKeys _),
    "q93_sequence_packing" -> ((s, d) => ops.Curation.sequencePacking(s, d)),
    "q94_bm25"             -> (ops.Scoring.bm25TopK _),
    "q95_lm_xent"          -> (ops.Scoring.lmCrossEntropy _),
    "q96_dsir_weights"     -> ((s, d) => ops.Scoring.dsirWeights(s, d)),
    "q97_pagerank"         -> ((s, d) => ops.Graph.pageRank(s, d)),
    "q98_domain_reservoir" -> ((s, d) => ops.Curation.domainReservoir(s, d)),
    "q99_vocab_encode"     -> ((s, d) => ops.Curation.vocabEncode(s, d)),
    "q100_asof_exec"       -> (ops.TemporalJoins.asofJoinExec _),
    "q101_hll_registers"   -> (ops.Sketches.hllRegisters _),
    "q102_stream_static"   -> (streaming.StreamingEvents.streamStaticEnrich _),
    "q103_rrf_hybrid"      -> (ops.Scoring.rrfHybrid _),
    "q104_jsonl_roundtrip" -> (sources.Sinks.jsonlRoundtrip _),
    "q105_random_projection" -> (ops.Similarity.randomProjection _),
    "q106_hard_negatives"  -> ((s, d) => ops.Similarity.hardNegatives(s, d)),
    "q107_dsir_resample"   -> ((s, d) => ops.Scoring.dsirResample(s, d)),
    "q108_bucketed_join"   -> (sources.Sinks.bucketedJoinAgg _),
    "q109_orc_roundtrip"   -> (sources.Sinks.orcRoundtrip _),
    "q110_compaction"      -> ((s, d) => sources.Sinks.compactSmallFiles(s, d)),
    "q111_kmeans"          -> ((s, d) => ops.KMeans.kmeans(s, d)),
    "q112_snapshot_diff"   -> (ops.Maintenance.snapshotDiff _),
    "q113_zorder_prune"    -> ((s, d) => ops.Maintenance.zorderPrunedScan(s, d)),
    "q114_hll_merge"       -> (ops.Sketches.hllMergedEstimate _),
    "q115_priority_sample" -> ((s, d) => ops.Curation.prioritySample(s, d)),
    "q116_grid_quantiles"  -> ((s, d) => ops.Sketches.gridQuantiles(s, d)),
    "q117_incremental_agg" -> ((s, d) => analytics.Relational.incrementalAgg(s, d)),
    "q118_semdedup"        -> ((s, d) => ops.Similarity.semDedupAuto(s, d)),
    "q119_containment"     -> ((s, d) => ops.Dedup.containmentJoin(s, d)),
    "q120_pii_scrub"       -> (ops.TextAnalysis.piiScrub _),
    "q121_hll_intersect"   -> (ops.Sketches.hllIntersections _),
    "q122_schema_evolution" -> (sources.Sinks.schemaEvolutionRead _),
    "q123_transitions"     -> ((s, d) => ops.Events.clickTransitions(s, d)),
    "q124_basket_pairs"    -> ((s, d) => analytics.Relational.basketPairs(s, d)),
    "q125_rfm_segments"    -> ((s, d) => analytics.Relational.rfmSegments(s, d)),
    "q126_assoc_rules"     -> ((s, d) => analytics.Relational.assocRules(s, d)),
    "q127_robust_outliers" -> ((s, d) => ops.Events.robustOutliers(s, d)),
    "q128_triangles"       -> ((s, d) => ops.Graph.triangles(s, d)),
    "q129_dedup_apply"     -> (ops.Clusters.dedupApply _),
    "q130_integrity_manifest" -> (ops.Maintenance.integrityManifest _),
    "q131_lang_drift"      -> ((s, d) => ops.TextAnalysis.langDrift(s, d)),
    "q132_cohort_retention" -> (ops.Events.cohortRetention _),
    "q133_substring_dedup" -> ((s, d) => ops.Curation.substringDedup(s, d)),
    "q138_substring_apply" -> ((s, d) => ops.Curation.substringDedupApply(s, d)),
    "q139_semdedup_ivf"    -> ((s, d) => ops.Similarity.semDedupIvf(s, d)),
    "q140_semdedup_apply"  -> ((s, d) => ops.Similarity.semDedupApply(s, d)),
    "q141_cms_registers"   -> ((s, d) => ops.Sketches.cmsRegisters(s, d)),
    "q142_gopher_rules"    -> ((s, d) => ops.TextAnalysis.gopherRules(s, d)),
    "q143_leakage_safe_split" -> ((s, d) => ops.Clusters.leakageSafeSplit(s, d)),
    "q134_bpe_merges"      -> ((s, d) => ops.Bpe.bpeMerges(s, d)),
    "q135_heavy_hitters"   -> ((s, d) => ops.Sketches.heavyHitters(s, d)),
    "q136_chunk_sliding"   -> ((s, d) => ops.Curation.chunkSliding(s, d)),
    "q137_bpe_encode"      -> ((s, d) => ops.Bpe.bpeEncode(s, d)),
    "q144_stream_cms"      -> (streaming.StreamingEvents.streamCmsRegisters _),
    "q145_bpe_fertility"   -> ((s, d) => ops.Bpe.bpeFertility(s, d)),
    "q146_boilerplate"     -> ((s, d) => ops.Curation.boilerplateDetect(s, d)),
    "q147_boilerplate_apply" -> ((s, d) => ops.Curation.boilerplateApply(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    etl.Transform.oracle ++ etl.Normalize.oracle ++ etl.Upsert.oracle ++ etl.Extract.oracle ++
      etl.Pipeline.oracle ++
      etl.Constraints.oracle ++
      sources.Sinks.oracle ++ sources.FetchSource.oracle ++
      analytics.Relational.oracle ++ ops.Events.oracle ++ ops.TemporalJoins.oracle ++
      ops.Dedup.oracle ++ ops.Similarity.oracle ++ ops.Skew.oracle ++
      ops.Scoring.oracle ++ ops.Graph.oracle ++ ops.Sketches.oracle ++
      ops.KMeans.oracle ++ ops.Maintenance.oracle ++ ops.Bpe.oracle ++
      ops.Clusters.oracle ++ ops.Curation.oracle ++
      ops.TextAnalysis.oracle ++
      ops.Multimodal.oracle ++ streaming.StreamingEvents.oracle ++
      streaming.StatefulSessions.oracle
}
