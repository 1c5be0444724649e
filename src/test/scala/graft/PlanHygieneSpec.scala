package graft

/** Fleet-wide plan hygiene: no batch entry may plan a cartesian product
  * or nested-loop join unless it is on the declared allowlist of
  * broadcast-single-row patterns. This is the "would it survive 100×"
  * gate in executable form — a regression that turns an equi-join into a
  * cross shape fails here even while values stay correct at fixture SF.
  */
class PlanHygieneSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  /** Entries whose plans legitimately contain a broadcast nested-loop —
    * every one broadcasts a single global-aggregate row or a fixed-k set
    * (query vectors/panels, bucket grids, version cuts) or a
    * dimension-sized TPC-H scalar/IN subquery, never a fact-sized
    * relation. The set is DERIVED from [[nestedLoopBroadcastBound]],
    * where each entry's claim is a measured, asserted row bound rather
    * than prose. The pin stays directional: entries may LEAVE the set
    * (an improvement), but any entry gaining a nested-loop join fails
    * the sweep, and any allowlisted entry whose broadcast side outgrows
    * its declared bound fails the executable bound test below.
    */
  private def allowedNestedLoop: Set[String] = nestedLoopBroadcastBound.keySet

  // stream_* entries execute their streaming query on construction (the
  // memory-sink harness), and the file-watch scan has its own spec —
  // plan shape for streams is pinned in the streaming suites instead.
  private def swept(name: String): Boolean =
    !name.startsWith("stream_") && name != "scan_inventory"

  /** The EXECUTABLE form of the allowlist above: per entry, the maximum
    * row count any BroadcastNestedLoopJoin broadcast side may reach at
    * the gate SF — measured, then pinned to the smallest round number
    * that states the entry's claim ("1-row aggregate", "fixed-k panel",
    * "dimension-sized subquery"). A prose claim of "broadcasts ≤ k rows"
    * that is actually data-sized fails HERE, not in a code review: the
    * bound is checked against the exchange's real `numOutputRows` metric
    * after executing the entry, so the allowlist can no longer admit a
    * fact-table-sized nested loop by assertion. Bounds are small
    * constants for fixed-k claims; the TPC-H scalar/IN-subquery entries
    * get a dimension-scale bound (they grow with dimension tables, never
    * with lineitem — 2000 at sf0.001 is 20× any dimension there and 3×
    * BELOW the smallest fact table, so a fact-sized side still fails).
    */
  private val nestedLoopBroadcastBound: Map[String, Long] = Map(
    "embed_cosine_topk" -> 8,
    // the 1-row query vector plus the 16-row candidate cut (the MMR
    // rerank budget - fixed k, never data-sized)
    "embed_mmr_rerank" -> 32,
    // broadcast 1-row pooled-moment aggregate (theta + pooled pre-mean)
    "analytics_cuped" -> 8,
    // two 1-row CI order-statistic broadcasts onto the 1-row point lift
    "analytics_subsample_ci" -> 8,
    // rides bm25_posting's 1-row (n_docs, avgdl) stats broadcast and
    // cosineTopK's 1-row query vector
    "text_hybrid_retrieval" -> 8,
    // the declared query PANEL (nQueries = 20), not a single vector
    "embed_knn_join" -> 32,
    "embed_ann_ivf" -> 64,
    // the 1-row query-vector broadcast (the cosineTopK shape)
    "embed_ann_beam" -> 8,
    // the same 1-row query-vector broadcast attach, once per descent
    "embed_ann_hnsw" -> 8,
    // the 1-row changed-node counter crossed onto the 1-row round-1 stats
    "embed_knn_descent" -> 8,
    "embed_ann_recall" -> 8, "multimodal_embed" -> 8,
    "text_edit_distance" -> 8, "text_bm25_topk" -> 8,
    "dq_volume_anomaly" -> 8,
    // the broadcast side is the DISTINCT-DAY list, not a 1-row aggregate
    // (the first claim this gate falsified: measured 30 rows at sf0.001)
    // — calendar-bounded, never data-sized
    "events_rolling_users" -> 64,
    // same day-spine shape as events_rolling_users (30-day horizon)
    "events_stickiness" -> 64,
    "text_heavy_hitters" -> 8, "text_collocations" -> 8,
    "text_langid_ngram" -> 8, "sync_summary" -> 8, "events_funnel" -> 8,
    "text_lm_crossentropy" -> 8, "curation_mix_rebalance" -> 8,
    "curation_mix_upsample" -> 8, "graph_pagerank" -> 8,
    "analytics_market_basket" -> 8, "text_tfidf_topterms" -> 8,
    "cdc_time_travel" -> 8, "agg_equidepth_hist" -> 8,
    "tpch_q9_profit" -> 2000, "tpch_q11_stock" -> 2000,
    "tpch_q16_partsupp" -> 2000, "tpch_q20_promo" -> 2000,
    "tpch_q22_dormant" -> 2000,
    "analytics_chisq" -> 8, "analytics_pareto80" -> 8,
    "curation_dsir_weights" -> 8, "analytics_bucket_assign" -> 8,
    "graph_degree_dist" -> 8, "warehouse_cascade_delete" -> 8,
    "agg_cms_heavy_hitters" -> 8, "curation_quantile_norm" -> 8,
    "graph_hits" -> 8, "embed_matryoshka" -> 8, "events_decayed_topk" -> 8,
    "text_bpe_encode" -> 8, "text_bpe_fertility" -> 8,
    "agg_kmv_intersect" -> 8, "warehouse_bitemporal" -> 8,
    "dq_benford" -> 16, "analytics_rfm" -> 8, "dq_psi_drift" -> 8,
    "analytics_survival_km" -> 8, "graph_modularity" -> 8,
    "embed_recall_curve" -> 8, "events_power_curve" -> 8,
    // broadcast 1-row (N, V) unigram smoothing totals
    "text_lm_perplexity3" -> 8,
    // broadcast 1-row total-revenue aggregate (the share-threshold cut)
    "analytics_abc_xyz" -> 8,
    // broadcast 1-row corpus watermark (the analytics_rfm shape)
    "dq_freshness" -> 8,
    // broadcast 6-row threshold panel + 1-row totals over the length
    // histogram
    "curation_length_sweep" -> 8,
    // rides text_langid_ngram's langs×1 profile-array broadcast
    "text_lang_confusion" -> 8,
    // broadcast 1-row corpus day-midpoint (the dq_psi_drift shape)
    "dq_ks_test" -> 8,
    // rides text_lm_perplexity3's 1-row smoothing-totals broadcast plus
    // a 6-row threshold panel and a 1-row totals row
    "curation_perplexity_sweep" -> 8,
    // broadcast 1-row log-split cut (the cdc_time_travel shape)
    "warehouse_scd2_merge" -> 8,
    // broadcast 1-row bigram-type total (the continuation denominator)
    "text_lm_kneser_ney" -> 8,
    // broadcast 4-row (bands, rows) configuration grid
    "dedup_lsh_calibration" -> 8,
    // broadcast 1-row (total, n_cells) index totals
    "embed_ivf_balance" -> 8,
    // broadcast language margin (catalog-sized) + 1-row corpus total
    "curation_source_divergence" -> 16,
    // broadcast 2-word query signature + exact-rerank query vector
    "embed_binary_quant" -> 8,
    // broadcast 5-row chain grid + 1-row base/total effect rows
    "events_markov_attribution" -> 8,
    // broadcast 6-row degree-threshold panel
    "graph_rich_club" -> 8,
    // broadcast 1-row corpus watermark (the dq_freshness shape)
    "warehouse_ttl_audit" -> 8,
    // two broadcast 1-row counter aggregates (truth / true-positive)
    "dedup_minhash_pr_audit" -> 8,
    // per-layout 1-row counter aggregates + the 1-row truth count
    "dedup_lsh_pr_matrix" -> 8,
    // broadcast 1-row (n_docs, avgdl) corpus stats (the bm25_topk shape)
    "text_bm25_posting" -> 8,
    // broadcast 1-row type count deriving the uniform start (r9: the
    // pinned 0.2 literal became 1/K)
    "events_markov_steady" -> 8,
    // broadcast 1-row max-doc_id cut + 1-row ln-ln fit row
    "text_heaps_fit" -> 8,
    // broadcast 1-row token total + 1-row ordered-cum normalizer
    "curation_temperature_mix" -> 8,
    // broadcast 1-row |E| (the graph_modularity shape)
    "graph_conductance" -> 8,
    // (r14: embed_pca_power / embed_pca_top2 left this map — past the
    // memoized dims²-bounded covariance both are driver-side scalar
    // work now, no broadcast nested-loop shapes remain)
    // broadcast 1-row L2/cos summary
    "embed_drift" -> 8,
    // broadcast 1-row uniformity row onto the 1-row alignment row
    "embed_uniformity" -> 8,
    // broadcast 1-row basket count
    "events_type_lift" -> 8,
    // broadcast 1-row (N, V) train-split smoothing totals
    "text_lm_stupid_backoff" -> 8,
    // broadcast 1-row total-positions count
    "text_ngram_coverage" -> 8,
    // per-budget 1-row candidate counters + the broadcast query row
    // (the embed_cosine_topk shape, three branches)
    "embed_multiprobe_sweep" -> 16,
    // broadcast 1-row token total onto the 11-row count grid
    "text_good_turing" -> 8,
    // broadcast 1-row corpus doc count (fold/source cells are equi-joins)
    "curation_kfold_balance" -> 8,
    // 1-row median / doc-count / ECE rows (the dq_ks_test shape)
    "curation_quality_calibration" -> 8,
    // three 1-row audit aggregates crossed into the single output row
    "dq_blocking_quality" -> 8,
    // broadcast 1-row (n, S) corpus totals (the analytics_gini class;
    // since r14 the entry is the X288 integer rendering — same plan)
    "analytics_theil" -> 8,
    // the kept X288 probe name aliases the same implementation/plan
    "analytics_theil_micro" -> 8,
    // the embed_cosine_topk query-row broadcast inside the exact leg
    "embed_rank_fusion" -> 8,
    // two 1-row per-half recency watermarks (the analytics_rfm shape)
    "analytics_rfm_migration" -> 8,
    // the X130 sketch-pair stage: #types-row sketch relation broadcast
    // into the non-equi (t1 <> t2) pair join
    "agg_theta_diff" -> 8,
    // 1-row budget/level/k rows onto the |sources|-row capacity table
    "curation_unimax_alloc" -> 8,
    // broadcast 1-row corpus watermark (the dq_freshness shape)
    "warehouse_retention_plan" -> 8)

  test("every BNLJ broadcast side stays within its declared row bound") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val offenders = nestedLoopBroadcastBound.toSeq.sortBy(_._1)
      .filter { case (n, _) => SparkEntry.queries.contains(n) }
      .flatMap { case (name, bound) =>
        val df = SparkEntry.queries(name)(spark, sf001)
        df.collect() // populate SQL metrics on THIS queryExecution's tree
        val plan = df.queryExecution.executedPlan
        val bnljBuilds: Seq[SparkPlan] =
          collectWithSubqueries(plan) {
            case j: BroadcastNestedLoopJoinExec => j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            }
          }
        bnljBuilds.flatMap { build =>
          val rows: Option[Long] = collectFirst(build) {
            case e: BroadcastExchangeExec => e.metrics("numOutputRows").value
            case r: ReusedExchangeExec => r.child match {
              case e: BroadcastExchangeExec => e.metrics("numOutputRows").value
              case _ => -1L
            }
          }
          rows match {
            case None => Some(s"$name: BNLJ build side has no broadcast " +
              s"exchange to measure (plan: ${build.nodeName})")
            case Some(n) if n > bound =>
              Some(s"$name: BNLJ broadcast side has $n rows > declared bound $bound")
            case _ => None
          }
        }
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  /** Entries whose plans legitimately contain a PARTITIONLESS window —
    * every one windows over a COLLAPSED relation (a value histogram,
    * per-bucket subtotals, or a fixed-k prefix), never the row-sized
    * input, so the forced single partition is bounded by value/bucket
    * cardinality, not data volume. Each value documents the tiny
    * relation. The pin is directional like the nested-loop one: an
    * entry gaining an UNDECLARED global window fails the sweep — the
    * `WindowExec: No Partition Defined` warnings in the logs are
    * exactly these declared sites and nothing else.
    */
  private val allowedGlobalWindow: Map[String, String] = Map(
    "agg_equidepth_hist" -> "cross-bucket prefix over per-bucket count subtotals (fixed bucket grid)",
    "analytics_bucket_assign" -> "cross-bucket prefix over per-bucket counts (fixed candidate-bucket grid)",
    "analytics_chisq" -> "global chi-square term sum over the (event_type x value-band) contingency cells",
    "analytics_order_concurrency" -> "running sum over the dense calendar-day grid (bounded by the date span, ~2.5k rows)",
    "analytics_pareto80" -> "range-partition offset cumsum over 32 per-partition subtotal rows",
    "analytics_survival_km" -> "risk/survival cumsums over the lifetime-day histogram (calendar-bounded)",
    "analytics_skyline" -> "cross-bucket prefix over per-price-bucket maxima",
    "curation_quantile_norm" -> "range-partition offset cumsum over 32 per-partition subtotal rows",
    "curation_shard_pack" -> "cross-bucket prefix over doc_id-bucket token subtotals (corpus/100 rows)",
    "curation_weighted_sample" -> "rank over the already-limited top-k (k=50) sample",
    "embed_ann_pq" -> "code rank over the already-limited 8-row seed pick (once per unpersisted consumer)",
    "text_bpe_encode" -> "merge rank over the already-limited 5-row top-pair table",
    "text_bpe_fertility" -> "same 5-row merge-rank window (shared X121 encode stage)",
    "events_funnel" -> "running min over the 3-row per-stage bound relation",
    "graph_degree_dist" -> "cumulative share over the distinct-degree histogram",
    "events_power_curve" -> "running share over the <=31-row active-days histogram",
    "analytics_gini" -> "rank-offset cumsum over 32 per-partition subtotal rows (the X83 pattern)",
    "analytics_abc_xyz" -> "same 32-row per-partition revenue-prefix cumsum as analytics_gini",
    "text_zipf_fit" -> "log-rank window over the already-limited top-1000 vocabulary cut",
    "dq_id_gaps" -> "boundary stitch over the 32-row per-range-bucket (min,max) summary",
    "embed_kmeans" -> "seed rank over the already-limited 4-row md5 pick (the embed_ann_pq shape)",
    "events_slo_burn" -> "trailing 7-row frame over the observed-day histogram (calendar-bounded)",
    "curation_pack_efficiency" -> "rides curation_shard_pack's 5-row doc_id-bucket prefix window (shared relation)",
    "text_heaps_fit" -> "ordered prefix sums over the <=8-row doc_id-decile histogram",
    "text_ngram_coverage" -> "rank + cumulative over the already-limited top-1000 trigram cut (the zipf class)",
    "curation_temperature_mix" -> "ordered normalizer cumsum over the 5-row per-language table",
    "curation_quality_calibration" -> "median-crossing cumsum over the distinct 6dp bits/token value histogram (domain-bounded, the outlier_mad class)",
    "embed_rank_fusion" -> "1-based ranks over the two already-limited top-20 retriever cuts (the zipf class, twice)",
    "curation_unimax_alloc" -> "capacity-sorted rank + prefix over the |sources|-row (catalog-sized) capacity table",
    "embed_ann_beam" -> "final rank over the ≤ beamWidth(=8)-row beam (the zipf class; per-round top-W uses TakeOrdered, not windows)",
    "embed_ann_hnsw" -> "final rank over the ≤ 8-row layer-0 beam (same class as embed_ann_beam; every descent round is a TakeOrdered)",
    "analytics_subsample_ci" -> "order statistics over the fixed 32-row subsample lift panel",
    "text_context_pack" -> "rank + budget cumsum over the already-limited top-64 candidate cut (the zipf class)",
    "text_hybrid_retrieval" -> "1-based ranks over the two already-limited top-10 retriever cuts (the embed_rank_fusion class)")

  test("partitionless windows only on the value-histogram allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => swept(n) }
      .flatMap { case (name, fn) =>
        val global = fn(spark, sf001).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
          case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
            if g.partitionSpec.isEmpty => g
        }
        if (global.nonEmpty && !allowedGlobalWindow.contains(name))
          Some(s"$name: ${global.size} undeclared partitionless window(s)")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no entry emits a DECIMAL wider than precision 18") {
    // the r10 analytics_theil failure class, closed permanently: DuckDB's
    // pandas bridge renders width>18 decimals as float64, so any p>18
    // decimal OUTPUT column hash-drifts on trailing-zero fraction digits
    // (e.g. 178728351.10 -> "178728351.1"). Internal math may stay wide;
    // the gate walks the OUTPUT schema only, including nested fields.
    def wide(dt: org.apache.spark.sql.types.DataType,
             path: String): Seq[String] = dt match {
      case d: org.apache.spark.sql.types.DecimalType if d.precision > 18 =>
        Seq(s"$path: $d")
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.toSeq.flatMap(f => wide(f.dataType, s"$path.${f.name}"))
      case a: org.apache.spark.sql.types.ArrayType =>
        wide(a.elementType, s"$path[]")
      case m: org.apache.spark.sql.types.MapType =>
        wide(m.keyType, s"$path<key>") ++ wide(m.valueType, s"$path<val>")
      case _ => Nil
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => swept(n) }
      .flatMap { case (name, fn) =>
        wide(fn(spark, sf001).schema, name)
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no cartesian product anywhere; nested-loop joins only on the allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => swept(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf001).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !allowedNestedLoop(name)
        if (cart) Some(s"$name: CartesianProduct")
        else if (bnlj) Some(s"$name: undeclared BroadcastNestedLoopJoin")
        else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
