package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sync.{Categories, Dedup, Matching, Pipeline, SyncInputs}
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 appears as a named entry in [[queries]];
  * entries with DuckDB-expressible semantics carry an [[oracleSql]] twin
  * (kept in [[graft.oracle.OracleSql]]) that must be value-identical.
  * All queries end with a deterministic full-key ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship: the whole reference pipeline (E2+E3, SURVEY.md §3) distilled
    * to its run summary — exercises scan-derivation, dedup (J7/A1), both
    * match passes (J1/J2), change detection (C1/C2) and all four action
    * tables. Driver smoke-checks rows > 0 on sf0.001 (always 1 row).
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.summary(Pipeline.syncFixture(spark, "/root/testdata/sf0.001"))

  private type Q = (SparkSession, String) => DataFrame

  /** The sync-reconciliation surface (SURVEY.md §2.1-§2.7). */
  private val syncQueries: Map[String, Q] = Map(
    "sync_dedup_mark" -> ((s, dir) =>
      Dedup.markDuplicates(SyncInputs.files(s, dir))
        .select("ord", "ino", "size", "file", "md5", "alias",
          "n_duplicates", "duplicates_csv")
        .orderBy("ord")),
    "sync_dup_report" -> ((s, dir) =>
      Dedup.duplicateReport(Dedup.markDuplicates(SyncInputs.files(s, dir)))),
    "sync_match_pass1" -> ((s, dir) =>
      Pipeline.syncFixture(s, dir).pass1
        .select("ord", "file", "md5", "project", "match")
        .orderBy("ord")),
    "sync_match_pass2" -> ((s, dir) =>
      Pipeline.syncFixture(s, dir).pass2
        .select("id", "p_file", "ino", "file", "is_alias", "match")
        .orderBy("id")),
    "sync_updates" -> ((s, dir) =>
      Pipeline.syncFixture(s, dir).updates
        .select("id", "new_file", "md5", "src")
        .orderBy("id", "src")),
    "sync_content_changed" -> ((s, dir) =>
      Pipeline.syncFixture(s, dir).contentChanged
        .select("id", "file", "file_md5", "project_md5", "src")
        .orderBy("id")),
    "sync_archives" -> ((s, dir) =>
      Pipeline.syncFixture(s, dir).archives
        .select("id", "p_file", "p_md5")
        .orderBy("id")),
    "sync_creates" -> ((s, dir) =>
      Pipeline.syncFixture(s, dir).creates
        .select("ord", "ino", "size", "file", "md5", "title", "is_dataset")
        .orderBy("ord")),
    "sync_processed_ids" -> ((s, dir) =>
      Matching.processedIds(Pipeline.syncFixture(s, dir).pass1).orderBy("id")),
    "sync_summary" -> ((s, dir) =>
      Pipeline.summary(Pipeline.syncFixture(s, dir))),
    "cat_folder_tree" -> ((s, dir) =>
      Categories.folderCats(SyncInputs.files(s, dir), "files")
        .select("type", "name", "short_name", "path")
        .orderBy("name")),
    "cat_create" -> ((s, dir) =>
      Categories.toCreate(
        Categories.folderCats(SyncInputs.files(s, dir), "files"),
        SyncInputs.serverCats(s, dir))
        .select("name", "category", "description", "short_name", "path")
        .orderBy("name")),
    "cat_matched" -> ((s, dir) =>
      Categories.matched(
        Categories.folderCats(SyncInputs.files(s, dir), "files"),
        SyncInputs.serverCats(s, dir))
        .select("id", "type", "name")
        .orderBy("id")),
    "cat_remove" -> ((s, dir) =>
      Categories.toRemove(
        Categories.folderCats(SyncInputs.files(s, dir), "files"),
        SyncInputs.serverCats(s, dir))
        .select("id", "category", "name")
        .orderBy("id")),
    "cat_dup_guard" -> ((s, dir) =>
      Categories.duplicateKeyGuard(SyncInputs.serverCats(s, dir))
        .select("category", "name", "n")
        .orderBy("category", "name")))

  /** Star-schema analytics (SURVEY.md §2.3-§2.5 at TPC-H shape). */
  private val analyticsQueries: Map[String, Q] = Map(
    "tpch_q1" -> (graft.ext.Analytics.q1PricingSummary(_, _)),
    "tpch_q3_top10" -> (graft.ext.Analytics.q3TopRevenue(_, _)),
    "tpch_q5_region" -> (graft.ext.Analytics.q5RegionVolume(_, _)),
    "tpch_q4_priority" -> (graft.ext.Analytics.q4PriorityCount(_, _)),
    "window_topk_orders" -> ((s, d) => graft.ext.Analytics.topKOrdersPerCustomer(s, d)),
    "rollup_lineitem" -> (graft.ext.Analytics.rollupLineitem(_, _)),
    "agg_stats_family" -> (graft.ext.Analytics.statsFamily(_, _)),
    "tpch_q12_conditional" -> (graft.ext.Analytics.q12Conditional(_, _)),
    "tpch_q14_promo" -> (graft.ext.Analytics.q14PromoShare(_, _)),
    "tpch_q18_large" -> ((s, d) => graft.ext.Analytics.q18LargeOrders(s, d)),
    "tpch_q19_disjunctive" -> (graft.ext.Analytics.q19Disjunctive(_, _)),
    "tpch_q2_minsupp" -> (graft.ext.Analytics.q2MinSupplier(_, _)),
    "tpch_q22_dormant" -> (graft.ext.Analytics.q22Dormant(_, _)),
    "tpch_q7_volume" -> (graft.ext.Analytics.q7Volume(_, _)),
    "tpch_q10_returns" -> (graft.ext.Analytics.q10Returns(_, _)),
    "tpch_q13_custdist" -> (graft.ext.Analytics.q13CustDist(_, _)),
    "tpch_q8_share" -> (graft.ext.Analytics.q8MarketShare(_, _)),
    "tpch_q21_waiting" -> (graft.ext.Analytics.q21WaitingSuppliers(_, _)),
    // q9/q11/q20 shapes over the deterministic partsupp stand-in (the
    // fixture set ships no partsupp.parquet; Analytics.partsupp derives
    // one identically in both engines)
    "tpch_q9_profit" -> (graft.ext.Analytics.q9Profit(_, _)),
    "tpch_q11_stock" -> (graft.ext.Analytics.q11ImportantStock(_, _)),
    "tpch_q20_promo" -> (graft.ext.Analytics.q20PromoSuppliers(_, _)),
    "tpch_q15_topsupp" -> (graft.ext.Analytics.q15TopSupplier(_, _)),
    "tpch_q16_partsupp" -> (graft.ext.Analytics.q16PartsSupplier(_, _)),
    // §2.8 scalar-function family, explicit (lower/upper/split/element_at/
    // regexp_extract/lpad/reverse/length/substr-of-md5/cast)
    "scalar_functions" -> ((s, d) => {
      val basename = element_at(split(col("file"), "/"), -1)
      SyncInputs.files(s, d).select(
        col("ord"), col("file"),
        lower(col("file")).as("lowered"),
        upper(basename).as("base_upper"),
        basename.as("basename"),
        regexp_extract(col("file"), "\\.([^.]+)$", 1).as("ext"),
        regexp_replace(basename, "\\.[^.]*$", "").as("stem"),
        lpad(col("ord").cast("string"), 6, "0").as("ord_padded"),
        reverse(col("md5")).as("md5_rev"),
        length(col("file")).cast("long").as("path_len"),
        substring(col("md5"), 1, 8).as("md5_prefix"))
        .orderBy("ord")
    }))

  /** X6 — event-stream analytics (SURVEY.md §2.9-§2.10). */
  private val eventsQueries: Map[String, Q] = Map(
    "events_tumbling" -> (graft.ext.Events.tumblingHourly(_, _)),
    "events_sliding" -> (graft.ext.Events.slidingQuarterHourly(_, _)),
    "events_sessions" -> ((s, d) => graft.ext.Events.sessionize(s, d)),
    // inactivity sessions split again at fixed duration-cap boundaries
    "events_sessions_capped" -> ((s, d) => graft.ext.Events.sessionizeCapped(s, d)),
    "events_json_extract" -> (graft.ext.Events.jsonExtractStats(_, _)),
    "events_lag_gap" -> (graft.ext.Events.lagLeadRank(_, _)),
    "events_rollup_day" -> (graft.ext.Events.rollupDaily(_, _)),
    "events_cube_day" -> (graft.ext.Events.cubeDaily(_, _)),
    "events_pivot_day" -> (graft.ext.Events.pivotDaily(_, _)),
    "set_ops_cohorts" -> (graft.ext.Analytics.setOps(_, _)),
    // ordered conversion funnel (first-touch, strictly-increasing times);
    // one shuffle on user_id however many steps
    "events_funnel" -> ((s, d) => graft.ext.Events.funnel(s, d)),
    "events_funnel_timing" -> ((s, d) => graft.ext.Events.funnelTiming(s, d)),
    // incremental aggregate maintenance: state ⊎ delta merged partials,
    // oracled against the full recompute (exact DECIMAL partials)
    "incr_agg_merge" -> ((s, d) => graft.ext.Materialize.incrAggMerge(s, d)),
    // Bloom-prefiltered selective shuffle join (custom codegen predicate
    // below the exchange; oracle states the plain join — no false
    // negatives, false positives die in the exact join)
    "join_bloom_prefilter" -> ((s, d) => graft.ext.Analytics.bloomPrefilterJoin(s, d)),
    // Z-order layout: per-bucket min/max stats + box-query skip decision
    "layout_zorder" -> ((s, d) => graft.ext.Layout.zorderBuckets(s, d)),
    // manual hot-key defense: deterministic probe salt + S-way build
    // replication; value-identical to the plain join the oracle states
    "join_salted_skew" -> ((s, d) => graft.ext.Analytics.saltedSkewJoin(s, d)),
    // bucket-by-key layout: the recurring join runs with ZERO join-side
    // exchanges (plan delta asserted in LayoutSpec); oracle = plain join
    "layout_bucket_join" -> ((s, d) => graft.ext.Layout.bucketJoin(s, d)),
    // per-language percent_rank/decile quantile normalization of the
    // quality score (distribution-relative curation thresholds)
    "text_quality_ranked" -> ((s, d) => graft.ext.TextStats.qualityRanked(s, d)),
    // per-user trailing-week RANGE frame over the per-day pre-aggregate
    "events_rolling_7d" -> ((s, d) => graft.ext.Events.rolling7d(s, d)),
    // weekly cohort retention matrix (cohort = first-event epoch-week)
    "events_retention" -> ((s, d) => graft.ext.Events.retentionCohorts(s, d)),
    // trailing-7d DISTINCT users: the non-mergeable windowed aggregate,
    // rewritten as a bounded-day-span join + re-aggregate (stays exact)
    "events_rolling_users" -> ((s, d) => graft.ext.Events.rollingDistinctUsers(s, d)),
    "tpch_q6_forecast" -> (graft.ext.Analytics.q6Forecast(_, _)),
    "tpch_q17_smallqty" -> (graft.ext.Analytics.q17SmallQuantity(_, _)),
    "events_histogram" -> (graft.ext.Analytics.valueHistogram(_, _)),
    "text_edit_distance" -> (graft.ext.Analytics.langEditDistance(_, _)),
    "curation_pipeline" -> ((s, d) => graft.ext.TextDedup.curationPipeline(s, d)))

  /** X1-X5 — LLM-data-pipeline operators (dedup / similarity / text /
    * multimodal; SURVEY.md §2.10).
    */
  private val llmQueries: Map[String, Q] = Map(
    "dedup_exact" -> (graft.ext.TextDedup.exact(_, _)),
    "dedup_minhash_pairs" -> (graft.ext.TextDedup.minhashPairs(_, _)),
    "text_simhash" -> (graft.ext.TextDedup.simhashQuery(_, _)),
    "dedup_simhash_pairs" -> ((s, d) => graft.ext.TextDedup.simhashPairs(s, d)),
    "text_simhash64" -> (graft.ext.TextDedup.simhash64Query(_, _)),
    "dedup_simhash64_pairs" -> ((s, d) => graft.ext.TextDedup.simhash64Pairs(s, d)),
    "dedup_method_report" -> (graft.ext.TextDedup.methodComparison(_, _)),
    // connected components over the thresholded minhash pair graph
    // (min-label propagation to convergence); cluster id = min doc_id,
    // canonical survivor flagged. Oracled against an unrolled fixed-round
    // propagation (components converge well inside the unroll bound).
    "dedup_clusters" -> ((s, d) => graft.ext.TextDedup.nearDupClusters(s, d)),
    "dedup_clusters_star" -> ((s, d) => graft.ext.TextDedup.nearDupClustersStar(s, d)),
    "dedup_incremental" -> ((s, d) => graft.ext.TextDedup.incrementalDedup(s, d)),
    "dedup_jaccard_pairs" -> ((s, d) => graft.ext.TextDedup.jaccardPairs(s, d)),
    "embed_cosine_topk" -> ((s, d) => graft.ext.Similarity.cosineTopK(s, d)),
    "embed_ann_lsh" -> ((s, d) => graft.ext.Similarity.annLshTopK(s, d)),
    "embed_knn_join" -> ((s, d) => graft.ext.Similarity.knnJoin(s, d)),
    "dedup_embed_pairs" -> ((s, d) => graft.ext.Similarity.embedCosinePairs(s, d)),
    // SemDeDup-shape semantic dedup: min-id representative per similar
    // set (pairwise-greedy, single pass — no iteration)
    "dedup_semantic_keep" -> ((s, d) => graft.ext.Similarity.semanticKeep(s, d)),
    // thresholded cosine pair graph labeled by star connected components
    "dedup_semantic_clusters" -> ((s, d) => graft.ext.Similarity.semanticClusters(s, d)),
    // multi-probe LSH: query bucket + 8 one-flip neighbours (recall repair)
    "embed_ann_multiprobe" -> ((s, d) => graft.ext.Similarity.annMultiProbeTopK(s, d)),
    // X268: HNSW-shape beam search over the deterministic sign-LSH kNN
    // graph — the graph-index ANN tier; walk replayed move-for-move by
    // the unrolled twin
    "embed_ann_beam" -> ((s, d) => graft.ext.Similarity.beamSearchTopK(s, d)),
    "embed_ann_hnsw" -> ((s, d) => graft.ext.Similarity.hnswTopK(s, d)),
    "embed_mmr_rerank" -> ((s, d) => graft.ext.Similarity.mmrRerank(s, d)),
    "embed_residual_energy" -> ((s, d) => graft.ext.Similarity.residualEnergy(s, d)),
    // probe-budget sweep: recall@k + candidate volume at 1/5/9 probes
    "embed_multiprobe_sweep" -> ((s, d) => graft.ext.Similarity.multiprobeSweep(s, d)),
    // per-label centroids (DECIMAL-exact) + inter-centroid cosine matrix
    "embed_centroid_sim" -> ((s, d) => graft.ext.Similarity.centroidSim(s, d)),
    "embed_kmeans" -> ((s, d) => graft.ext.Similarity.embedKmeans(s, d)),
    "embed_outliers" -> ((s, d) => graft.ext.Similarity.embedOutliers(s, d)),
    "embed_pca_power" -> ((s, d) => graft.ext.Similarity.embedPcaPower(s, d)),
    // two-component PCA by Hotelling deflation off the shared Gram-kernel
    // covariance: second axis + explained-variance shares + orthogonality
    "embed_pca_top2" -> ((s, d) => graft.ext.Similarity.embedPcaTop2(s, d)),
    // split-half per-dim centroid drift monitor (encoder/distribution shift)
    "embed_drift" -> ((s, d) => graft.ext.Similarity.embedDrift(s, d)),
    // Wang-Isola alignment/uniformity over md5-bucketed pair samples
    "embed_uniformity" -> ((s, d) => graft.ext.Similarity.embedUniformity(s, d)),
    // SQ8 reconstruction-error QC per label (is 4x compression safe here)
    "embed_quant_error" -> ((s, d) => graft.ext.Similarity.quantizationError(s, d)),
    "text_langid" -> (graft.ext.TextStats.langId(_, _)),
    "text_langid_ngram" -> ((s, d) => graft.ext.TextStats.langIdNgram(s, d)),
    "text_quality" -> (graft.ext.TextStats.quality(_, _)),
    "text_lexical_complexity" -> ((s, d) => graft.ext.TextStats.lexicalComplexity(s, d)),
    "text_tokens" -> (graft.ext.TextStats.tokenStats(_, _)),
    "text_chunk_overlap" -> ((s, d) => graft.ext.TextStats.chunkOverlap(s, d)),
    "text_mattr" -> ((s, d) => graft.ext.TextStats.mattr(s, d)),
    "text_phrase_search" -> ((s, d) => graft.ext.Search.phraseSearch(s, d)),
    "text_context_pack" -> ((s, d) => graft.ext.Search.contextPack(s, d)),
    "curation_gate_ablation" -> ((s, d) => graft.ext.TextStats.gateAblation(s, d)),
    "text_hybrid_retrieval" -> ((s, d) => graft.ext.Search.hybridRetrieval(s, d)),
    "text_fingerprint" -> (graft.ext.TextStats.fingerprint(_, _)),
    "text_heavy_hitters" -> ((s, d) => graft.ext.TextStats.heavyHitters(s, d)),
    // Gopher-style within-doc n-gram repetition quality filter
    "text_repetition" -> ((s, d) => graft.ext.TextStats.repetition(s, d)),
    // PII scrubbing pass (synthetic deterministic PII; backslash-free
    // RE2∩Java regex subset so the twin survives the three-way replay)
    "text_pii_redact" -> ((s, d) => graft.ext.TextStats.piiRedact(s, d)),
    // BM25 keyword relevance top-k (fixed small query → narrow per-doc
    // tf arrays + one broadcast stats row + TakeOrderedAndProject)
    "text_bm25_topk" -> ((s, d) => graft.ext.Search.bm25TopK(s, d)),
    // posting-list BM25: dynamic query semi-joined to the (doc,term,tf)
    // posting relation, fixed-order pivot sum (== the fixed-term form)
    "text_bm25_posting" -> ((s, d) => graft.ext.Search.bm25Posting(s, d)),
    // conjunctive boolean retrieval over the posting stream (EXISTS-oracle)
    "text_search_and" -> ((s, d) => graft.ext.Search.searchAnd(s, d)),
    // deterministic A/B arms by salted hash + per-arm lift readout
    "analytics_ab_lift" -> ((s, d) => graft.ext.Analytics.abLift(s, d)),
    // per-doc cross-entropy under the corpus-trained unigram LM
    // (CCNet-style quality signal; (doc,type)-combined scoring join)
    "text_lm_crossentropy" -> ((s, d) => graft.ext.LangModel.lmCrossEntropy(s, d)),
    "text_lm_perplexity3" -> ((s, d) => graft.ext.LangModel.perplexity3(s, d)),
    "text_lm_kneser_ney" -> ((s, d) => graft.ext.LangModel.kneserNey(s, d)),
    // HELD-OUT stupid-backoff trigram scoring over the X92 train/test
    // split — every backoff tier genuinely fires, tier mix in-output
    "text_lm_stupid_backoff" -> ((s, d) => graft.ext.LangModel.stupidBackoff(s, d)),
    "text_zipf_fit" -> ((s, d) => graft.ext.LangModel.zipfFit(s, d)),
    // Heaps'-law vocabulary-growth fit over cumulative doc_id-decile
    // prefixes (the vocab-at-100TB planning curve)
    "text_heaps_fit" -> ((s, d) => graft.ext.LangModel.heapsFit(s, d)),
    // FORCAST readability grade (sentence-free formula; vowel-group
    // syllable proxy) — narrow per-row expressions, zero shuffle
    "text_readability" -> ((s, d) => graft.ext.TextStats.readability(s, d)),
    // temperature-scaled (alpha=0.7) multilingual sampling weights +
    // effective epochs per language
    "curation_temperature_mix" -> ((s, d) => graft.ext.TextStats.temperatureMix(s, d)),
    // within-table functional-dependency audit over a declared panel
    "dq_fd_discovery" -> ((s, d) => graft.ext.DataQuality.fdDiscovery(s, d)),
    // header-vs-lineitem exact-decimal money reconciliation per status
    "dq_reconciliation" -> ((s, d) => graft.ext.DataQuality.moneyReconciliation(s, d)),
    // per-source exact/near dup membership rates (the data-card table)
    "curation_dup_rate_by_source" -> ((s, d) => graft.ext.TextDedup.dedupRateBySource(s, d)),
    // top-k trigram-type coverage of all trigram positions
    "text_ngram_coverage" -> ((s, d) => graft.ext.LangModel.ngramCoverage(s, d)),
    // BPE tokenizer training's pair-selection step: top adjacent char
    // pairs over word TYPES weighted by count (vocabulary-collapsed)
    "text_bpe_merges" -> ((s, d) => graft.ext.LangModel.bpeMerges(s, d)),
    // BPE APPLY: top-5 merges encoded via boundary-safe literal replace
    "text_bpe_encode" -> ((s, d) => graft.ext.LangModel.bpeEncode(s, d)),
    // uniform-target language rebalancing: integer-threshold md5 sampler,
    // group stats broadcast, the sample itself a narrow scan filter
    "curation_mix_rebalance" -> ((s, d) => graft.ext.TextStats.mixRebalance(s, d)),
    "curation_length_sweep" -> ((s, d) => graft.ext.TextStats.lengthSweep(s, d)),
    "curation_perplexity_sweep" -> ((s, d) => graft.ext.LangModel.perplexitySweep(s, d)),
    "text_lang_confusion" -> ((s, d) => graft.ext.TextStats.langConfusion(s, d)),
    "curation_split_leakage" -> ((s, d) => graft.ext.TextStats.splitLeakage(s, d)),
    "curation_source_divergence" -> ((s, d) => graft.ext.TextStats.sourceDivergence(s, d)),
    "curation_composite_gate" -> ((s, d) => graft.ext.TextStats.compositeGate(s, d)),
    // DSIR hashed-ngram importance weights: target-vs-raw log-ratio scoring
    "curation_dsir_weights" -> ((s, d) => graft.ext.LangModel.dsirWeights(s, d)),
    // deterministic A-Res weighted sample (ln(u)/w priority, top-50)
    "curation_weighted_sample" -> ((s, d) => graft.ext.TextStats.weightedSample(s, d)),
    // cross-language quantile normalization at exact integer ranks
    "curation_quantile_norm" -> ((s, d) => graft.ext.TextStats.quantileNormalize(s, d)),
    // cumulative token coverage in size order; exact-integer 80% flag
    "analytics_pareto80" -> ((s, d) => graft.ext.TextStats.paretoCoverage(s, d)),
    // the upsampling twin: whole epochs + fractional md5-admitted extras
    "curation_mix_upsample" -> ((s, d) => graft.ext.TextStats.mixUpsample(s, d)),
    // top co-occurring token pairs (per-doc distinct self-join + PMI)
    "text_collocations" -> ((s, d) => graft.ext.Search.collocations(s, d)),
    // posting-list relation as a first-class artifact (sorted postings)
    "text_inverted_index" -> ((s, d) => graft.ext.Search.invertedIndex(s, d)),
    // 3-round PageRank power iteration over the cust<->supp trade graph
    "graph_pagerank" -> ((s, d) => graft.ext.Graphs.pagerank(s, d)),
    // degree-oriented node-iterator triangle counting (co-order parts)
    "graph_triangles" -> ((s, d) => graft.ext.Graphs.triangles(s, d)),
    // deterministic synchronous label-propagation communities (3 rounds)
    "graph_label_prop" -> ((s, d) => graft.ext.Graphs.labelProp(s, d)),
    // degree histogram + cumulative share over the distinct-degree relation
    "graph_degree_dist" -> ((s, d) => graft.ext.Graphs.degreeDist(s, d)),
    // 3-hop BFS frontier expansion from the 10 smallest part ids
    "graph_bfs_hops" -> ((s, d) => graft.ext.Graphs.bfsHops(s, d)),
    // AS-OF join as union+running-window (no O(n*m) pair space)
    "events_asof_join" -> ((s, d) => graft.ext.Events.asofJoin(s, d)),
    "events_asof_forward" -> ((s, d) => graft.ext.Events.asofForward(s, d)),
    // first-order Markov transition matrix of per-user event sequences
    "events_transition_matrix" -> ((s, d) => graft.ext.Events.transitionMatrix(s, d)),
    // last-touch revenue attribution via the as-of running window
    "events_attribution" -> ((s, d) => graft.ext.Events.attribution(s, d)),
    "events_markov_attribution" -> ((s, d) => graft.ext.Events.markovAttribution(s, d)),
    // exact decile-trimmed mean per event type (integer-rank cuts)
    "agg_trimmed_mean" -> ((s, d) => graft.ext.Analytics.trimmedMean(s, d)),
    // top session-opening event-type paths (first 3 per session)
    "events_top_paths" -> ((s, d) => graft.ext.Events.topPaths(s, d)),
    // hourly-volume lag autocorrelation (daily-seasonality detector)
    "events_autocorr" -> ((s, d) => graft.ext.Events.autocorr(s, d)),
    // equi-depth bucket assignment + per-bucket depth audit (X70 composed)
    "analytics_bucket_assign" -> ((s, d) => graft.ext.Analytics.bucketAssign(s, d)),
    // edit-distance<=1 similarity join via deletion-neighborhood blocking
    "text_fuzzy_join" -> ((s, d) => graft.ext.Linkage.fuzzyNameJoin(s, d)),
    // association rules (support/confidence/lift) over co-ordered parts
    "analytics_market_basket" -> ((s, d) => graft.ext.Linkage.marketBasket(s, d)),
    // KMV sketch mergeability law: day partials rolled == direct monthly
    "agg_kmv_rollup" -> ((s, d) => graft.ext.Analytics.kmvRollup(s, d)),
    // relational HyperLogLog: integer-exact registers, est beside exact
    "agg_hll_distinct" -> ((s, d) => graft.ext.Sketches.hllDistinct(s, d)),
    // HLL mergeability law: per-type registers max-merged == direct
    "agg_hll_rollup" -> ((s, d) => graft.ext.Sketches.hllRollup(s, d)),
    // span-level decontamination: cut contaminated 8-gram windows, keep the doc
    "text_decontaminate_spans" -> ((s, d) => graft.ext.TextDedup.decontaminateSpans(s, d)),
    // int8 scalar quantization + integer-dot quantized top-k (SQ8)
    "embed_scalar_quant" -> ((s, d) => graft.ext.Similarity.scalarQuantTopK(s, d)),
    "embed_binary_quant" -> ((s, d) => graft.ext.Similarity.binaryQuantTopK(s, d)),
    // HITS hubs/authorities: 2 exact-integer rounds on the cust->part graph
    "graph_hits" -> ((s, d) => graft.ext.Graphs.hits(s, d)),
    // CEP with negation: view->purchase<=1h with no error between
    "events_cep_pattern" -> ((s, d) => graft.ext.Events.cepCleanConversion(s, d)),
    // per-column completeness/cardinality profile off ONE unpivot pass
    "dq_null_profile" -> ((s, d) => graft.ext.DataQuality.nullProfile(s, d)),
    // MDM survivorship: modal/min/max attribute merge per dup cluster
    "warehouse_golden_record" -> ((s, d) => graft.ext.Warehouse.goldenRecord(s, d)),
    // exponential-decay leaderboard in exact shifted-BIGINT arithmetic
    "events_decayed_topk" -> ((s, d) => graft.ext.Events.decayedTopK(s, d)),
    // frontier Bellman-Ford shortest paths, integer trade-distance weights
    "graph_sssp" -> ((s, d) => graft.ext.Graphs.sssp(s, d)),
    // ExactSubstr cross-doc span dedup: min-doc_id owner keeps the gram
    "dedup_substring_spans" -> ((s, d) => graft.ext.TextDedup.crossDocSpans(s, d)),
    // product quantization ADC top-k with md5-seeded codebooks
    "embed_ann_pq" -> ((s, d) => graft.ext.Similarity.pqTopK(s, d)),
    // truncated-dim (Matryoshka) retrieval recall audit vs full-dim
    "embed_matryoshka" -> ((s, d) => graft.ext.Similarity.matryoshkaRecall(s, d)),
    // trailing-7d distinct users per day by per-day HLL register merge
    "agg_hll_sliding" -> ((s, d) => graft.ext.Sketches.hllSlidingDays(s, d)),
    // per-edge Jaccard link prediction off the shared triangle kernel
    "graph_edge_jaccard" -> ((s, d) => graft.ext.Graphs.edgeJaccard(s, d)),
    "graph_adamic_adar" -> ((s, d) => graft.ext.Graphs.adamicAdar(s, d)),
    // asymmetric set-containment join (quote/subsumption detector)
    "dedup_containment_pairs" -> ((s, d) => graft.ext.TextDedup.containmentPairs(s, d)),
    // cohort LTV triangle: exact-DECIMAL running revenue per cohort week
    "events_cohort_ltv" -> ((s, d) => graft.ext.Events.cohortLtv(s, d)),
    // k-core dense backbone via iterative peeling to the fixpoint
    "graph_kcore" -> ((s, d) => graft.ext.Graphs.kcore(s, d)),
    "graph_ktruss" -> ((s, d) => graft.ext.Graphs.ktruss(s, d)),
    // referential audit: orphan children + childless parents per FK edge
    "dq_fk_orphans" -> ((s, d) => graft.ext.DataQuality.fkOrphanAudit(s, d)),
    "dq_key_candidates" -> ((s, d) => graft.ext.DataQuality.keyCandidates(s, d)),
    "dq_rule_violations" -> ((s, d) => graft.ext.DataQuality.ruleViolations(s, d)),
    "dq_fk_inference" -> ((s, d) => graft.ext.DataQuality.fkInference(s, d)),
    "dq_freshness" -> ((s, d) => graft.ext.DataQuality.freshness(s, d)),
    "dq_id_gaps" -> ((s, d) => graft.ext.DataQuality.idGaps(s, d)),
    // sweep-line open-order concurrency (per-month peak / end-of-month)
    "analytics_order_concurrency" -> ((s, d) => graft.ext.Analytics.orderConcurrency(s, d)),
    // mergeable log2-bucket quantile sketch with the merge law in-output
    "agg_log2_quantiles" -> ((s, d) => graft.ext.Sketches.log2Quantiles(s, d)),
    // incremental cluster maintenance: delta edges contracted through
    // yesterday's labels, merge-CC over the contracted graph only
    "incr_cc_merge" -> ((s, d) => graft.ext.TextDedup.incrementalClusterMerge(s, d)),
    // KMV set-intersection estimate per event-type pair (theta sketch)
    "agg_kmv_intersect" -> ((s, d) => graft.ext.Analytics.kmvIntersect(s, d)),
    // RAKE keyword extraction, integer-deg scoring, gaps-and-islands phrases
    "text_rake_keywords" -> ((s, d) => graft.ext.Search.rakeKeywords(s, d)),
    // bitemporal (valid x transaction time) reconstruction over a 2x2 grid
    "warehouse_bitemporal" -> ((s, d) => graft.ext.Warehouse.bitemporalQuery(s, d)),
    // Benford first-digit audit with literal-constant reference probs
    "dq_benford" -> ((s, d) => graft.ext.DataQuality.benfordAudit(s, d)),
    // grid-density clustering (DBSCAN relative): dense cells + star CC
    "spatial_grid_clusters" -> ((s, d) => graft.ext.Spatial.gridClusters(s, d)),
    // perceptual-hash near-dup images over the real PNG decode path
    "multimodal_phash" -> ((s, d) => graft.ext.Multimodal.phashPairs(s, d)),
    "multimodal_spectral_flux" -> (graft.ext.Multimodal.spectralFlux(_, _)),
    "multimodal_edge_energy" -> ((s, d) => graft.ext.Multimodal.edgeEnergy(s, d)),
    // rule-threshold RFM segmentation (stable, auditable, no quantile drift)
    "analytics_rfm" -> ((s, d) => graft.ext.Analytics.rfmSegments(s, d)),
    // monthly new-vs-repeat order/revenue decomposition (first-order date)
    "analytics_repeat_revenue" -> ((s, d) => graft.ext.Analytics.repeatRevenue(s, d)),
    "analytics_gini" -> ((s, d) => graft.ext.Analytics.giniRevenue(s, d)),
    "analytics_abc_xyz" -> ((s, d) => graft.ext.Analytics.abcXyz(s, d)),
    "analytics_skew_kurtosis" -> ((s, d) => graft.ext.Analytics.skewKurtosis(s, d)),
    // git-style three-way snapshot merge with surfaced conflicts
    "warehouse_three_way_merge" -> ((s, d) => graft.ext.Warehouse.threeWayMerge(s, d)),
    // PSI distribution drift between stream halves, fixed value bands
    "dq_psi_drift" -> ((s, d) => graft.ext.DataQuality.psiDrift(s, d)),
    "dq_emd_drift" -> ((s, d) => graft.ext.Analytics.emdDrift(s, d)),
    "dq_ks_test" -> ((s, d) => graft.ext.DataQuality.ksTest(s, d)),
    "events_forecast_baseline" -> ((s, d) => graft.ext.Events.forecastBaseline(s, d)),
    // per-language tokenizer fertility/compression off the X121 encoder
    "text_bpe_fertility" -> ((s, d) => graft.ext.LangModel.bpeFertility(s, d)),
    // inter-arrival regularity (cv) bot screen, exact decimal moments
    "events_bot_regularity" -> ((s, d) => graft.ext.Events.botRegularity(s, d)),
    // dedup yield curve across similarity cutoffs, one pair-relation pass
    "dedup_threshold_sweep" -> ((s, d) => graft.ext.Similarity.dedupThresholdSweep(s, d)),
    "dedup_lsh_calibration" -> ((s, d) => graft.ext.TextDedup.lshCalibration(s, d)),
    "dedup_minhash_pr_audit" -> ((s, d) => graft.ext.TextDedup.minhashPrAudit(s, d)),
    "dedup_lsh_pr_matrix" -> ((s, d) => graft.ext.TextDedup.lshPrMatrix(s, d)),
    // censoring-aware Kaplan-Meier customer-lifetime curve
    "analytics_survival_km" -> ((s, d) => graft.ext.Analytics.survivalKm(s, d)),
    // Newman modularity terms for the label-prop partition (quality audit)
    "graph_modularity" -> ((s, d) => graft.ext.Graphs.modularity(s, d)),
    // cut-quality conductance for the SAME label-prop partition
    "graph_conductance" -> ((s, d) => graft.ext.Graphs.conductance(s, d)),
    // random walk with restart into a 5-seed customer set (PPR)
    "graph_ppr" -> ((s, d) => graft.ext.Graphs.personalizedPagerank(s, d)),
    // recall@k curve of single-bucket sign-LSH vs the exact ranking
    "embed_recall_curve" -> ((s, d) => graft.ext.Similarity.recallCurve(s, d)),
    // integer CUSUM changepoint (cross-multiplied deviation, exact argmax)
    "events_changepoint_cusum" -> ((s, d) => graft.ext.Events.changepointCusum(s, d)),
    "events_peak_detection" -> ((s, d) => graft.ext.Events.peakDetection(s, d)),
    "events_slo_burn" -> ((s, d) => graft.ext.Events.sloBurn(s, d)),
    // power-user curve: active-days histogram + cumulative share
    "events_power_curve" -> ((s, d) => graft.ext.Events.powerCurve(s, d)),
    "events_seasonality" -> ((s, d) => graft.ext.Events.seasonality(s, d)),
    "events_stickiness" -> ((s, d) => graft.ext.Events.stickiness(s, d)),
    "events_ewma" -> ((s, d) => graft.ext.Events.ewma(s, d)),
    "events_markov_steady" -> ((s, d) => graft.ext.Events.markovSteady(s, d)),
    "events_growth_accounting" -> ((s, d) => graft.ext.Events.growthAccounting(s, d)),
    "graph_components" -> ((s, d) => graft.ext.Graphs.components(s, d)),
    "graph_random_walks" -> ((s, d) => graft.ext.Graphs.randomWalks(s, d)),
    "graph_walk_cooccurrence" -> ((s, d) => graft.ext.Graphs.walkCooccurrence(s, d)),
    "graph_rich_club" -> ((s, d) => graft.ext.Graphs.richClub(s, d)),
    "graph_two_hop" -> ((s, d) => graft.ext.Graphs.twoHop(s, d)),
    // degree assortativity (Newman r) from exact DECIMAL moments
    "graph_assortativity" -> ((s, d) => graft.ext.Graphs.assortativity(s, d)),
    // per-column Shannon entropy via the ordered count-of-counts sum
    "dq_entropy_profile" -> ((s, d) => graft.ext.DataQuality.entropyProfile(s, d)),
    // 2-D Pareto frontier via two-phase distributed prefix max
    "analytics_skyline" -> ((s, d) => graft.ext.Analytics.skyline(s, d)),
    // exact per-segment MAD outliers via the value-histogram median
    "dq_outlier_mad" -> ((s, d) => graft.ext.Analytics.outlierMad(s, d)),
    // exact-moment least squares (slope/intercept/r2 per return flag)
    "agg_regression_exact" -> ((s, d) => graft.ext.Analytics.regressionExact(s, d)),
    "analytics_corr_matrix" -> ((s, d) => graft.ext.Analytics.corrMatrix(s, d)),
    // changelog time travel: snapshots reconstructed at three cuts
    "cdc_time_travel" -> ((s, d) => graft.ext.Warehouse.cdcTimeTravelQuery(s, d)),
    // per-doc TF-IDF top-3 keyword extraction (WindowGroupLimit)
    "text_tfidf_topterms" -> ((s, d) => graft.ext.Search.tfidfTopTerms(s, d)),
    // exact equi-depth boundaries via two-phase distributed prefix sum
    "agg_equidepth_hist" -> ((s, d) => graft.ext.Analytics.equidepthHist(s, d)),
    // debounce-leading dedup: keep burst-starting events only
    "events_throttle_dedup" -> ((s, d) => graft.ext.Events.throttleDedup(s, d)),
    // interval-overlap join on a 6h grid (sessions x promo windows)
    "events_interval_join" -> ((s, d) => graft.ext.Events.intervalJoin(s, d)),
    // incremental JOIN-view maintenance: delta-only join + partial merge
    "incr_join_merge" -> ((s, d) => graft.ext.Materialize.incrJoinMerge(s, d)),
    // anti-entropy replica diff via per-range count+xor fingerprints
    "dq_merkle_ranges" -> ((s, d) => graft.ext.DataQuality.merkleRanges(s, d)),
    // canonical-representative keep per blocking key (WindowGroupLimit)
    "dedup_priority_keep" -> ((s, d) => graft.ext.TextDedup.priorityKeep(s, d)),
    "curation_soft_dedup_weights" -> ((s, d) => graft.ext.TextDedup.softDedupWeights(s, d)),
    // per-cluster verified-pair support audit (over-merge diagnostic)
    "dedup_cluster_quality" -> ((s, d) => graft.ext.TextDedup.clusterQuality(s, d)),
    // event-type market-basket lift over user-day baskets
    "events_type_lift" -> ((s, d) => graft.ext.Events.typeLift(s, d)),
    // local clustering coefficient (triangles / neighbor pairs)
    "graph_clustering_coeff" -> ((s, d) => graft.ext.Graphs.clusteringCoeff(s, d)),
    // time-weighted average per user (DECIMAL-exact weighted sums)
    "events_twap" -> ((s, d) => graft.ext.Events.twap(s, d)),
    // run-length encoding of per-user event-type sequences
    "events_rle" -> ((s, d) => graft.ext.Events.eventRle(s, d)),
    // chi-square (lang x source) independence profile, DECIMAL-exact total
    "analytics_chisq" -> ((s, d) => graft.ext.Analytics.chisqProfile(s, d)),
    // point-in-time join of facts onto an SCD2 dimension ledger
    "warehouse_pit_join" -> ((s, d) => graft.ext.Warehouse.pitJoin(s, d)),
    // per-day volume z-score monitor (exact integral moments)
    "dq_volume_anomaly" -> ((s, d) => graft.ext.DataQuality.volumeAnomalies(s, d)),
    "curation_split" -> ((s, d) => graft.ext.TextStats.trainTestSplit(s, d)),
    // deterministic per-language top-N draw (WindowGroupLimit plan)
    "curation_stratified_sample" -> ((s, d) => graft.ext.TextStats.stratifiedSample(s, d)),
    // token-budget shard packing via a two-phase distributed prefix sum
    "curation_shard_pack" -> ((s, d) => graft.ext.TextStats.shardPack(s, d)),
    "curation_pack_efficiency" -> ((s, d) => graft.ext.TextStats.packEfficiency(s, d)),
    "curation_contamination" -> ((s, d) => graft.ext.TextDedup.contamination(s, d)),
    // per-doc duplication coverage (Lee et al. 2022 diagnostic)
    "text_dup_coverage" -> ((s, d) => graft.ext.TextDedup.dupCoverage(s, d)),
    "curation_contamination_report" -> ((s, d) => graft.ext.TextDedup.contaminationReport(s, d)),
    // first-occurrence n-gram novelty per doc (crawl-admission signal)
    "text_novelty" -> ((s, d) => graft.ext.TextDedup.noveltyScore(s, d)),
    // corpus top-1k vocabulary coverage per doc (OOV/gibberish filter)
    "text_vocab_coverage" -> ((s, d) => graft.ext.TextStats.vocabCoverage(s, d)),
    // Count-Min-Sketch heavy hitters: 1024-cell sketch, min-probe estimates
    "agg_cms_heavy_hitters" -> ((s, d) => graft.ext.TextStats.cmsHeavyHitters(s, d)),
    // pairwise source shingle-overlap matrix (dedup planning signal)
    "analytics_source_overlap" -> ((s, d) => graft.ext.TextDedup.sourceOverlap(s, d)),
    // cross-doc boilerplate chunk removal (CCNet/RefinedWeb paragraph
    // dedup at fixed 5-word-chunk granularity)
    "text_strip_boilerplate" -> ((s, d) => graft.ext.TextDedup.stripBoilerplate(s, d)),
    "dq_report" -> (graft.ext.DataQuality.report(_, _)),
    "multimodal_decode" -> (graft.ext.Multimodal.decodeQuery(_, _)),
    "multimodal_jpeg" -> (graft.ext.Multimodal.jpegQuery(_, _)),
    "multimodal_pcm_features" -> (graft.ext.Multimodal.pcmQuery(_, _)),
    "multimodal_pcm_vad" -> (graft.ext.Multimodal.pcmVad(_, _)),
    "multimodal_pcm_clipping" -> (graft.ext.Multimodal.pcmClippingQuery(_, _)),
    "multimodal_pcm_resample" -> (graft.ext.Multimodal.pcmResampleQuery(_, _)),
    "multimodal_pcm_pitch" -> (graft.ext.Multimodal.pcmPitch(_, _)),
    "multimodal_channel_stats" -> (graft.ext.Multimodal.channelStatsQuery(_, _)),
    "multimodal_tile_stats" -> (graft.ext.Multimodal.tileStats(_, _)),
    // luminance-histogram entropy off the real decode (flat-image QC)
    "multimodal_image_entropy" -> (graft.ext.Multimodal.imageEntropy(_, _)),
    "multimodal_meta" -> (graft.ext.Multimodal.metaQuery(_, _)),
    "multimodal_frames" -> ((s, d) => graft.ext.Multimodal.frameSample(s, d)),
    "multimodal_resize" -> (graft.ext.Multimodal.resize(_, _)),
    // multimodal → ANN bridge: deterministic md5-derived 8-dim feature
    // embedding per payload, broadcast-query cosine top-k (the encoder
    // body is the only stub; the payload→vector→match plumbing is real)
    "multimodal_embed" -> ((s, d) => graft.ext.Multimodal.embedTopK(s, d)),
    // Good-Turing freq-of-freq smoothing + unseen mass (r10)
    "text_good_turing" -> ((s, d) => graft.ext.LangModel.goodTuring(s, d)),
    // Chao1 / Good's coverage / Simpson richness per source + corpus
    "text_vocab_richness" -> ((s, d) => graft.ext.LangModel.vocabRichness(s, d)),
    // k-fold assignment stratification-balance audit (X160's twin)
    "curation_kfold_balance" -> ((s, d) => graft.ext.TextStats.kfoldBalance(s, d)),
    // reliability diagram + ECE of the cheap quality score vs the LM signal
    "curation_quality_calibration" -> ((s, d) => graft.ext.TextStats.qualityCalibration(s, d)),
    // ER blocking reduction-ratio / pairs-completeness audit
    "dq_blocking_quality" -> ((s, d) => graft.ext.DataQuality.blockingQuality(s, d)),
    // Theil-T inequality with between/within-nation decomposition.
    // r14: the entry ships the X288 integer rendering (micro-unit
    // ratios, cents revenue) — CORRECTNESS_r13 proved it driver-green
    // while the decimal rendering stayed driver-red for a 4th round;
    // the decimal form survives as theilRevenueDecimal for the law
    // specs that tie the two renderings together.
    "analytics_theil" -> ((s, d) => graft.ext.Analytics.theilRevenueMicro(s, d)),
    // X290 (r13): structure-only control of the rollup family — kept as
    // the permanent probe that isolates explode/group structure from
    // revenue values (its siblings X288/X289 became the shipped
    // renderings of analytics_theil / analytics_hier_rollup in r14)
    "analytics_hier_rollup_counts" -> ((s, d) => graft.ext.Analytics.hierRollupCounts(s, d)),
    // X291 (r14 decomposition): per-type singleton oracle-bridge probes —
    // same adversarial literals as r13's combined probe, one suspect
    // type per entry, so a red cell NAMES the broken bridge type
    "dq_probe_int64" -> ((s, _) => graft.ext.DataQuality.probeInt64(s)),
    "dq_probe_dec96" -> ((s, _) => graft.ext.DataQuality.probeDec96(s)),
    "dq_probe_dec182" -> ((s, _) => graft.ext.DataQuality.probeDec182(s)),
    "dq_probe_double" -> ((s, _) => graft.ext.DataQuality.probeDouble(s)),
    // r13 combined four-type probe, kept for driver-surface continuity:
    // every name in CORRECTNESS_r13 must keep existing (a disappeared
    // entry reads as a regression). Its known-red cell is the documented
    // r13 diagnostic; the singletons above carry the bisection forward.
    "dq_probe_types" -> ((s, _) => graft.ext.DataQuality.probeTypes(s)),
    // X288/X289 (r13) probe names, likewise kept: since r14 the shipped
    // analytics_theil / analytics_hier_rollup ARE these renderings, so
    // the probes alias the same implementations (and twins) verbatim.
    "analytics_theil_micro" -> ((s, d) => graft.ext.Analytics.theilRevenueMicro(s, d)),
    "analytics_hier_rollup_cents" -> ((s, d) => graft.ext.Analytics.hierRollupCents(s, d)),
    // X292 (r13): one NN-Descent refinement round over the shared
    // graph-ANN index — the linear at-scale kNN-graph improvement path
    "embed_knn_descent" -> ((s, d) => graft.ext.Similarity.knnDescentAudit(s, d)),
    // X267: ragged-hierarchy subtree rollup via bounded ancestor explode
    // (one shuffle, no iteration). r14: ships the X289 cents rendering
    // (all-BIGINT output, proven driver-green in CORRECTNESS_r13); the
    // decimal form survives as hierRollupDecimal for the law specs.
    "analytics_hier_rollup" -> ((s, d) => graft.ext.Analytics.hierRollupCents(s, d)),
    "analytics_cuped" -> ((s, d) => graft.ext.Analytics.cuped(s, d)),
    "analytics_subsample_ci" -> ((s, d) => graft.ext.Analytics.subsampleCi(s, d)),
    "analytics_did" -> ((s, d) => graft.ext.Analytics.diffInDiff(s, d)),
    "analytics_mde" -> ((s, d) => graft.ext.Analytics.mde(s, d)),
    "analytics_winsorized_mean" -> ((s, d) => graft.ext.Analytics.winsorizedMean(s, d)),
    "analytics_mann_whitney" -> ((s, d) => graft.ext.Analytics.mannWhitney(s, d)),
    // HyperBall register-exact neighbourhood function + harmonic centrality
    "graph_hyperball" -> ((s, d) => graft.ext.Graphs.hyperBall(s, d)),
    // cross-image duplicate-tile (watermark) detection off the real decode
    "multimodal_tile_dups" -> ((s, d) => graft.ext.Multimodal.tileDups(s, d)),
    // Lindley queue-wait audit via the running-min prefix rewrite
    "events_queue_wait" -> ((s, d) => graft.ext.Events.queueWait(s, d)),
    // outage interval-union availability per day (no double-counted overlap)
    "events_interval_union" -> ((s, d) => graft.ext.Events.intervalUnion(s, d)),
    // triplet-margin violation audit over md5-sampled triplets
    "embed_triplet_audit" -> ((s, d) => graft.ext.Similarity.tripletAudit(s, d)),
    // reciprocal-rank fusion of the exact + SQ8 retrievers (X253)
    "embed_rank_fusion" -> ((s, d) => graft.ext.Similarity.rankFusion(s, d)),
    // RFM segment transition matrix across the 1996 split (X257)
    "analytics_rfm_migration" -> ((s, d) => graft.ext.Analytics.rfmMigration(s, d)),
    // capped weighted supplier co-purchase projection (X258)
    "graph_bipartite_project" -> ((s, d) => graft.ext.Graphs.bipartiteProject(s, d)),
    // theta-sketch a-not-b estimate beside the exact anti count (X259)
    "agg_theta_diff" -> ((s, d) => graft.ext.Analytics.thetaDiff(s, d)),
    // global SSIM of the 2x block-mean reconstruction, exact moments (X255)
    "multimodal_image_ssim" -> ((s, d) => graft.ext.Multimodal.imageSsim(s, d)),
    // register-count sweep: the sketch-sizing error table (X254)
    "agg_hll_m_sweep" -> ((s, d) => graft.ext.Sketches.hllMSweep(s, d)),
    // UniMax closed-form waterfill budget allocation (X260)
    "curation_unimax_alloc" -> ((s, d) => graft.ext.TextStats.unimaxAlloc(s, d)),
    // RMS-AGC gain/headroom audit off the real PCM decode (X261)
    "multimodal_pcm_agc" -> ((s, d) => graft.ext.Multimodal.pcmAgc(s, d)),
    // GFS snapshot-retention expiry plan vs the corpus watermark (X262)
    "warehouse_retention_plan" -> ((s, d) => graft.ext.Warehouse.retentionPlan(s, d)),
    // sample-ratio-mismatch chi-square gate per experiment (X264)
    "events_srm_check" -> ((s, d) => graft.ext.Events.srmCheck(s, d)))

  /** ST1/ST2 streaming + S1-S5 source + K5 sink surfaces. */
  private val streamSourceSinkQueries: Map[String, Q] = Map(
    "stream_tumbling" -> (graft.streaming.EventStream.tumblingHourly(_, _)),
    "stream_tumbling_append" -> (graft.streaming.EventStream.tumblingHourlyAppend(_, _)),
    // the full streaming delivery loop: append-mode aggregate ->
    // writeStream into the gather DSv2 sink (STREAMING_WRITE, epoch-named
    // landing parts) -> read back through the same source's V2 scan;
    // oracled against the batch closed-window SQL, so the sink/scan
    // round-trip must be value-lossless
    "stream_sink_v2" -> (graft.streaming.EventStream.tumblingSinkV2(_, _)),
    // the continuous remote re-list (MICRO_BATCH_READ on the gather
    // source): one AvailableNow poll = one daemon list cycle; oracled
    // against the same twin as the batch scan_remote_v2
    "stream_scan_v2" -> (graft.streaming.EventStream.pollProjectsSnapshot(_, _)),
    "stream_range_join" -> (graft.streaming.EventStream.streamStreamRangeJoin(_, _)),
    "stream_left_join" -> (graft.streaming.EventStream.streamStreamLeftJoin(_, _)),
    "stream_sessions_append" -> (graft.streaming.EventStream.sessionWindowsAppend(_, _)),
    "stream_sessions" -> (graft.streaming.EventStream.sessionWindows(_, _)),
    "stream_dedup" -> (graft.streaming.EventStream.dedupDistinctPairs(_, _)),
    // stream-static broadcast enrichment join (static dim re-planned per
    // micro-batch; broadcast so the stream side never shuffles)
    "stream_static_join" -> (graft.streaming.EventStream.streamStaticProfileJoin(_, _)),
    // S1-S5 over the fixture dir itself (rows-only check: no DuckDB oracle
    // for arbitrary filesystem scans)
    "scan_inventory" -> ((s, d) =>
      graft.sources.FileInventory.inventory(s, d, "*.parquet")
        .select("path", "length").orderBy("path")),
    "sink_sql_insert" -> ((s, d) =>
      graft.sink.Actions.sqlInsertRows(
        Categories.folderCats(SyncInputs.files(s, d), "files")
          .select(col("type").as("category"), col("name"), col("short_name")))))

  /** Coverage closers for SURVEY.md §2: P1/P2 nested-struct normalization,
    * K1 JSON payload rendering (to_json), the salted skew-safe aggregate,
    * and the as-of join.
    */
  private val coverageQueries: Map[String, Q] = Map(
    // P1/P2 (DW.js:79-91): consume the API-faithful nested shape, filter
    // null metadata.file, project the nested struct flat. Two synthetic
    // null-metadata rows are injected to make P1 observable. The nested
    // list comes through the DataSourceV2 gather scan (file transport),
    // so this entry exercises the V2 source with Catalyst pruning the
    // wire read down to id/p_file/p_md5 through the nesting projection.
    "sync_normalize_projects" -> ((s, d) => {
      val nested = SyncInputs.nestedProjectsV2(s, d)
      val nulls = nested.sparkSession.range(2).select(
        (col("id") + 9900000L).as("id"),
        lit(null).cast(nested.schema("metadata").dataType).as("metadata"),
        lit(null).cast(nested.schema("attributes").dataType).as("attributes"))
      nested.unionByName(nulls)
        .filter(col("metadata.file").isNotNull)          // P1
        .select(col("id"), col("metadata.file.file").as("file"),  // P2
          col("metadata.file.md5").as("md5"))
        .orderBy("id")
    }),
    // K1 payload JSON (DW.js:357-367 metadata.file; _toSql stringify)
    "sink_create_payloads_json" -> ((s, d) => {
      val r = Pipeline.syncFixture(s, d)
      r.creates.select(col("ord"), col("title"),
        to_json(struct(col("file"), col("md5"))).as("file_json"))
        .orderBy("ord")
    }),
    "dedup_exact_salted" -> ((s, d) => graft.ext.TextDedup.exactSalted(s, d)),
    "events_asof_signup" -> (graft.ext.Events.asofSignup(_, _)),
    "events_range_join" -> ((s, d) => graft.ext.Events.rangeJoinSignupWindow(s, d)),
    // naive no-equi-key abs(Δt)<=w join, planned as a banded equi-join
    // by the injected BandJoinRewrite optimizer rule
    "events_band_join" -> ((s, d) => graft.ext.Events.bandJoinNearClicks(s, d)),
    // asymmetric (strictly-after) band conjuncts through the same rule
    "events_band_join_after" -> ((s, d) => graft.ext.Events.bandJoinClicksAfter(s, d)),
    // rows-only (Spark-internal hash family; portable twin: dedup_minhash_pairs)
    "dedup_minhash_ml" -> ((s, d) => graft.ext.TextDedup.mlMinhashPairs(s, d)),
    // faithful sequential-claim pass 2 (cogroup-per-md5 greedy); oracled
    // via a per-md5 recursive CTE (claims only interact within one md5
    // group, so recursion depth = that md5's unprocessed-project count)
    "sync_match_pass2_greedy" -> ((s, d) => {
      val r = Pipeline.syncFixture(s, d)
      Matching.pass2Greedy(r.marked, SyncInputs.projects(s, d), r.pass1)
        .orderBy("id")
    }),
    // streaming arbitrary state (flatMapGroupsWithState)
    "stream_stateful_counts" -> (graft.streaming.EventStream.statefulUserCounts(_, _)),
    // strict sequential rate limiter: keyed state recurrence (X71's gap)
    "stream_throttle_greedy" -> (graft.streaming.EventStream.throttleGreedy(_, _)),
    // streaming last-touch attribution: per-user keyed state, per-purchase rows
    "stream_attribution" -> (graft.streaming.EventStream.streamAttribution(_, _)),
    // streaming arbitrary state, new API (transformWithState + RocksDB)
    "stream_transform_state" -> (graft.streaming.EventStream.transformStateUserCounts(_, _)),
    // streaming keep-first dedup: transformWithState gate (X1's stream twin)
    "stream_dedup_state" -> (graft.streaming.EventStream.streamDedupState(_, _)),
    // streaming HLL: 256-byte sketch state per key (transformWithState)
    "stream_hll" -> (graft.streaming.EventStream.streamHll(_, _)),
    // timer-driven sessionization: transformWithState + event-time timers
    "stream_sessions_state" -> (graft.streaming.EventStream.sessionState(_, _)),
    // streaming top-k leaderboard: bounded ListState (fifth state shape)
    "stream_topk_state" -> (graft.streaming.EventStream.streamTopK(_, _)),
    // per-user dynamic sub-key profile: MapState (sixth state shape)
    "stream_map_state" -> (graft.streaming.EventStream.streamMapState(_, _)),
    // streaming CDC snapshot: update-if-newer ValueState, == batch cdc_apply
    "stream_cdc_state" -> (graft.streaming.EventStream.streamCdcSnapshot(_, _)),
    // streaming log2-bucket quantile sketch: 512-byte mergeable counter
    // state per key, p50/p90/p99 picks == the X130 batch rule
    "stream_quantile_state" -> (graft.streaming.EventStream.streamQuantileState(_, _)),
    "stream_max_gap_state" -> (graft.streaming.EventStream.streamMaxGap(_, _)),
    // streaming near-dup admission: per-band first-toucher ValueState gate
    // over the X2 banding (the crawl-tailer ingest filter)
    "stream_neardup_gate" -> (graft.streaming.EventStream.streamNearDupGate(_, _)),
    // X266: order-insensitive retraction variant of the gate — one
    // correction row per cross-batch ownership displacement; equals the
    // same min-owner oracle under ANY arrival order
    "stream_neardup_gate_anyorder" ->
      ((s, d) => graft.streaming.EventStream.streamNearDupGateAnyOrder(s, d)),
    // bounded-state Bloom admission gate, bit-sharded (X247)
    "stream_bloom_gate" -> ((s, d) => graft.streaming.EventStream.streamBloomGate(s, d)),
    // Lindley recurrence fold in keyed ValueState (X252) — the batch
    // twin's audit aggregate, row-identical on the ordered replay
    "stream_queue_wait" -> ((s, d) => graft.streaming.EventStream.streamQueueWait(s, d)),
    // monotone-horizon interval-union fold (X265) — the batch twin's
    // per-day totals, row-identical on the ordered replay
    "stream_interval_union" -> ((s, d) => graft.streaming.EventStream.streamIntervalUnion(s, d)),
    // oracled: sketch values surface as bound predicates beside their
    // exact twins (the oracle asserts the booleans literally TRUE), so
    // out-of-bound sketch drift fails the hash gate; raw sketch numbers
    // stay observable via sketchFamilyRaw (bounds in ScaleDesignSpec)
    "agg_sketch_family" -> (graft.ext.Analytics.sketchFamily(_, _)),
    // KMV sketch via the typed Aggregator UDAF — deterministic set
    // property, so exactly oracled (not bound-gated like agg_sketch_family)
    "agg_kmv_distinct" -> (graft.ext.Analytics.kmvDistinct(_, _)),
    // IVF over deterministic hash-seeded cells — quantizer, assignment
    // and probe are all exactly hash-oracled (was rows-only when the
    // quantizer was trained KMeans); recall additionally asserted in
    // CosineSimSpec AND oracled as the embed_ann_recall bound below
    "embed_ann_ivf" -> ((s, d) => graft.ext.Similarity.ivfTopK(s, d)),
    "embed_ivf_balance" -> ((s, d) => graft.ext.Similarity.ivfBalance(s, d)),
    // oracled recall bound for the IVF tier (sketchFamily pattern): the
    // oracle derives the exact top-k count and asserts recall_ok TRUE
    "embed_ann_recall" -> ((s, d) => graft.ext.Similarity.annRecallBound(s, d)),
    // S6 as a first-class DataSourceV2 scan: 4-partition paged read of the
    // landed project list with an EqualTo filter pushed into the source
    // and the read schema pruned to 3 of 6 wire columns (plan asserted in
    // GatherRestSourceSpec; the HTTP transport of the same scan is spec'd
    // there too)
    "scan_remote_v2" -> ((s, d) =>
      s.read.format(graft.sources.v2.GatherSource.Format)
        .schema(graft.sources.v2.GatherSource.ProjectsSchema)
        .option("url", SyncInputs.projectsWireUrl(s, d))
        .option("parts", "4")
        .load()
        .filter(col("iam") === "gatherbot" && col("is_dataset"))
        .select("id", "p_file", "title")
        .orderBy("id")),
    // aggregate pushdown through the V2 boundary: COUNT(*)/COUNT(col)/
    // MIN/MAX compute inside the scan (one partial row per partition,
    // Spark merges), composed with a pushed filter — plan-asserted in
    // GatherRestSourceSpec
    "scan_remote_agg" -> ((s, d) =>
      s.read.format(graft.sources.v2.GatherSource.Format)
        .schema(graft.sources.v2.GatherSource.ProjectsSchema)
        .option("url", SyncInputs.projectsWireUrl(s, d))
        .option("parts", "4")
        .load()
        .filter(col("is_dataset"))
        .agg(count(lit(1)).as("n_projects"), min("id").as("min_id"),
          max("id").as("max_id"), count(col("p_md5")).as("n_md5"))),
    // Disk layout, static half: aggregate one day of the day-partitioned
    // landing copy — the literal reaches the scan as a PartitionFilter
    // (one directory of ~30 read; plan asserted in LayoutSpec)
    "layout_partition_prune" -> ((s, d) => graft.ext.Layout.partitionPruneDay(s, d)),
    // Disk layout, dynamic half: the day predicate sits on a broadcast
    // calendar dim, so the fact scan is pruned at runtime via
    // dynamicpruningexpression (plan asserted in LayoutSpec)
    "layout_dpp_join" -> ((s, d) => graft.ext.Layout.dppJoin(s, d)),
    // Cross-run incremental sync: run 2's actions as a snapshot diff
    // (create/rename/content_changed/archive) against run 1's file ledger
    // (graft.sync.Incremental; the daemon loop DW.js:32,67 relationally)
    "sync_incremental_actions" -> ((s, d) =>
      graft.sync.Incremental.diffActions(
        SyncInputs.files(s, d), SyncInputs.filesRun2(s, d))
        .orderBy(col("action"), coalesce(col("file"), col("old_file")),
          col("md5"))),
    // SCD2 match ledger after folding two runs' pass-1 matches: unchanged
    // matches keep their open row, vanished/changed ones close at run 2,
    // new versions open at run 2
    "sync_ledger_scd2" -> ((s, d) => {
      val run1 = Pipeline.syncFixture(s, d).pass1
      val run2 = Matching.pass1(
        Dedup.markDuplicates(SyncInputs.filesRun2(s, d)),
        SyncInputs.projects(s, d))
      val l1 = graft.sync.Incremental.updateLedger(
        graft.sync.Incremental.emptyLedger(s), run1, 1L)
      graft.sync.Incremental.updateLedger(l1, run2, 2L)
        .orderBy("id", "matched_ino", "valid_from")
    }))

  /** Row-level warehouse maintenance + table-lifecycle operators. */
  private val warehouseQueries: Map[String, Q] = Map(
    // MERGE INTO (upsert): full-outer key join + branch projection —
    // update/delete/insert branches all populated by the derived change set
    "merge_upsert" -> ((s, d) => graft.ext.Warehouse.mergeUpsertQuery(s, d)),
    "warehouse_merge_full" -> ((s, d) => graft.ext.Warehouse.mergeFullSync(s, d)),
    "warehouse_ttl_audit" -> ((s, d) => graft.ext.Warehouse.ttlAudit(s, d)),
    // Data Vault hub/link/satellite load audit (md5 keys + hashdiff)
    "warehouse_data_vault" -> ((s, d) => graft.ext.Warehouse.dataVaultAudit(s, d)),
    // CDC changelog -> snapshot compaction (last op per key wins,
    // deletes drop the key; one window shuffle)
    "cdc_apply" -> ((s, d) => graft.ext.Warehouse.cdcApplyQuery(s, d)),
    "warehouse_scd2_build" -> ((s, d) => graft.ext.Warehouse.scd2BuildQuery(s, d)),
    "warehouse_scd2_merge" -> ((s, d) => graft.ext.Warehouse.scd2MergeQuery(s, d)),
    // version-to-version table diff on content fingerprints (full-outer
    // key join over two narrow (key, md5) projections)
    "warehouse_snapshot_diff" -> ((s, d) => graft.ext.Warehouse.snapshotDiffQuery(s, d)),
    // GDPR cascade-delete audit through the customer->orders->lineitem FK chain
    "warehouse_cascade_delete" -> ((s, d) => graft.ext.Warehouse.cascadeDelete(s, d)),
    // native UNPIVOT of the wide day×type matrix; oracle states the
    // round-trip law unpivot(pivot(x)) == groupBy(x)
    "events_unpivot" -> ((s, d) => graft.ext.Events.unpivotDaily(s, d)),
    // explicit GROUPING SETS (both marginals in one expand+aggregate pass)
    "agg_grouping_sets" -> ((s, d) => graft.ext.Events.groupingSetsDaily(s, d)),
    // temporal scalar-function family (truncation/extraction/epoch/
    // interval arithmetic), the date twin of scalar_functions
    "date_functions" -> ((s, d) => graft.ext.Events.dateFunctions(s, d)),
    // explicit window-frame family: whole-partition first/last/nth,
    // cume_dist, and a bounded ROWS moving frame
    "window_frame_family" -> ((s, d) => graft.ext.Analytics.windowFrameFamily(s, d)),
    // uniform-grid spatial proximity join (3×3 neighbor replication on
    // the broadcast side, exact integer distances); oracle states the
    // naive all-pairs filter — agreement proves grid losslessness
    "spatial_grid_join" -> ((s, d) => graft.ext.Spatial.proximityQuery(s, d)),
    // schema evolution on read: mergeSchema over two snapshot
    // generations, added column NULL for pre-evolution rows
    "schema_evolution" -> ((s, d) => graft.ext.Layout.schemaEvolutionRead(s, d)),
    // checkpointed stop/restart across a two-half landing: offsets +
    // watermark + open-window state all resume, union of both runs'
    // emissions == the batch closed-window aggregate (append twin)
    "stream_restart_resume" -> (graft.streaming.EventStream.restartResume(_, _)),
    // small-file compaction: 64-file fragmented landing copy rewritten to
    // 4 ts-clustered files; values unchanged (file-count delta in LayoutSpec)
    "layout_compaction" -> ((s, d) => graft.ext.Layout.compactionQuery(s, d)),
    "layout_clustering_depth" -> ((s, d) => graft.ext.Layout.clusteringDepth(s, d)),
    // higher-order array lambdas (transform/filter/aggregate/sort/slice):
    // per-doc math as narrow codegen expressions, zero shuffle
    "array_hof_family" -> ((s, d) => graft.ext.TextStats.arrayHofFamily(s, d)),
    // deterministic content-hash Bernoulli sample (exact 16/256 keep set)
    "curation_bernoulli_sample" -> ((s, d) => graft.ext.TextStats.bernoulliSample(s, d)),
    // generator surface: posexplode with preserved 0-based position
    "generator_family" -> ((s, d) => graft.ext.TextStats.generatorTokens(s, d)),
    // LISTAGG-style ordered string aggregation (sorted collect_set)
    "agg_string_family" -> ((s, d) => graft.ext.Analytics.stringAggFamily(s, d)),
    // multiset EXCEPT ALL / INTERSECT ALL re-aggregated to multiplicities
    "set_ops_all" -> ((s, d) => graft.ext.Analytics.setOpsAll(s, d)),
    // all five join types over one key with null-extended tallies
    "join_type_family" -> ((s, d) => graft.ext.Analytics.joinTypeFamily(s, d)),
    // correlated EXISTS / NOT EXISTS / IN + scalar subquery through the
    // SQL front end (Catalyst rewrites to the hand-written J3/J4 shapes)
    "subquery_family" -> ((s, d) => graft.ext.Analytics.subqueryFamily(s, d)),
    // null propagation: COUNT(*) vs COUNT(col), null-skipping SUM,
    // COALESCE backfill, null-safe equality, BOOL_AND/OR, NULLIF
    "null_handling_family" -> ((s, d) => graft.ext.Analytics.nullHandlingFamily(s, d)),
    // calendar densify + forward fill (bounded by span-days per user)
    "events_gap_fill" -> ((s, d) => graft.ext.Events.gapFill(s, d)),
    // error-safe try_cast / try_divide (nulls, not task failures)
    "try_arithmetic_family" -> ((s, d) => graft.ext.Analytics.tryArithmeticFamily(s, d)),
    // exact PERCENTILE_DISC at rank ceil(p*n) — the exact twin of the
    // sketch-gated approx_percentile in agg_sketch_family
    "agg_percentile_disc" -> ((s, d) => graft.ext.Analytics.percentileDisc(s, d)),
    "agg_mode_family" -> ((s, d) => graft.ext.Analytics.modeFamily(s, d)),
    "join_lateral_topn" -> ((s, d) => graft.ext.Analytics.lateralTopN(s, d)),
    // radius-bounded nearest-facility (spatial argmin on the grid join)
    "spatial_nearest" -> ((s, d) => graft.ext.Spatial.nearestFacility(s, d)),
    // BIT_AND/OR/XOR aggregates (mask fold; map-side combinable)
    "agg_bitwise_family" -> ((s, d) => graft.ext.Analytics.bitwiseFamily(s, d)))

  /** The per-family maps that compose `queries`, named for diagnostics.
    * Exposed so DuplicateKeyGuardSpec can prove the `++` merge below drops
    * nothing: a key collision between families silently shadows the earlier
    * entry (this bit us once — an as-of twin hid X58 for a round).
    */
  private[graft] def queryFamilies: Seq[(String, Map[String, Q])] = Seq(
    "sync" -> syncQueries,
    "analytics" -> analyticsQueries,
    "events" -> eventsQueries,
    "llm" -> llmQueries,
    "streamSourceSink" -> streamSourceSinkQueries,
    "coverage" -> coverageQueries,
    "warehouse" -> warehouseQueries)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] =
    syncQueries ++ analyticsQueries ++ eventsQueries ++ llmQueries ++
      streamSourceSinkQueries ++ coverageQueries ++ warehouseQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
