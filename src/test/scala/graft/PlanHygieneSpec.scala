package graft

/** Fleet-wide plan hygiene: no batch entry may plan a cartesian product
  * or nested-loop join unless it is on the declared allowlist of
  * broadcast-single-row patterns. This is the "would it survive 100×"
  * gate in executable form — a regression that turns an equi-join into a
  * cross shape fails here even while values stay correct at fixture SF.
  */
class PlanHygieneSpec extends SparkSpec {

  /** Entries whose plans legitimately contain a broadcast nested-loop —
    * every one broadcasts a SINGLE row or a fixed-k set, never a
    * data-sized relation, so the "loop" is bounded by |broadcast| ≤ k:
    *
    *  - broadcast query vector / query set: embed_cosine_topk,
    *    embed_knn_join, embed_ann_ivf, embed_ann_recall, multimodal_embed,
    *    text_edit_distance, text_bm25_topk (one corpus-stats row)
    *  - broadcast single global-aggregate row (moments, totals,
    *    thresholds): dq_volume_anomaly, events_rolling_users,
    *    text_heavy_hitters, text_collocations, text_langid_ngram,
    *    sync_summary, events_funnel (per-stage bound row),
    *    text_lm_crossentropy (one (N,V) smoothing row),
    *    curation_mix_rebalance / curation_mix_upsample (one group-stats
    *    row), graph_pagerank (one node-count row per iteration),
    *    analytics_market_basket (one n_orders row),
    *    text_tfidf_topterms (one corpus-count row),
    *    cdc_time_travel (three version-cut rows),
    *    agg_equidepth_hist (B−1 = 7 rank-target rows),
    *    analytics_chisq (one N row), analytics_pareto80 (one
    *    corpus-total row), curation_dsir_weights (one (nt,nr)
    *    smoothing-totals row), analytics_bucket_assign (B−1 = 7
    *    boundary rows), graph_degree_dist (one node-total row),
    *    warehouse_cascade_delete (three 1-row audit-count crossJoins),
    *    agg_cms_heavy_hitters (one token-total row),
    *    curation_quantile_norm (one corpus-count row),
    *    graph_hits (two 1-row max-score normalization crossJoins)
    *  - TPC-H scalar/IN subqueries over dimension-sized sets:
    *    tpch_q9_profit, tpch_q11_stock, tpch_q16_partsupp, tpch_q20_promo,
    *    tpch_q22_dormant
    *
    * The pin is directional: entries may LEAVE this set (an improvement),
    * but any entry gaining a nested-loop join fails the sweep.
    */
  private val allowedNestedLoop: Set[String] = Set(
    "embed_cosine_topk", "embed_knn_join", "embed_ann_ivf",
    "embed_ann_recall", "multimodal_embed", "text_edit_distance",
    "text_bm25_topk",
    "dq_volume_anomaly", "events_rolling_users", "text_heavy_hitters",
    "text_collocations", "text_langid_ngram", "sync_summary",
    "events_funnel", "text_lm_crossentropy", "curation_mix_rebalance",
    "curation_mix_upsample", "graph_pagerank", "analytics_market_basket",
    "text_tfidf_topterms", "cdc_time_travel", "agg_equidepth_hist",
    "tpch_q9_profit", "tpch_q11_stock", "tpch_q16_partsupp",
    "tpch_q20_promo", "tpch_q22_dormant",
    "analytics_chisq", "analytics_pareto80", "curation_dsir_weights",
    "analytics_bucket_assign", "graph_degree_dist",
    "warehouse_cascade_delete", "agg_cms_heavy_hitters",
    "curation_quantile_norm", "graph_hits",
    // 1-row broadcast sides: the query vector / hit-count pair, the
    // reference-day aggregate, and the pivoted 1-row BPE merge table
    "embed_matryoshka", "events_decayed_topk", "text_bpe_encode",
    "text_bpe_fertility", // same pivoted 1-row merge table as the encode entry
    // t1 < t2 theta self-join of the per-type SKETCH relation — one row
    // per event type (5 at any sf), the corpus never enters the loop
    "agg_kmv_intersect",
    // broadcast 4-row (T,V) grid / 1-row total — the cdc_time_travel
    // cut-replication shape
    "warehouse_bitemporal", "dq_benford",
    // broadcast 1-row corpus-max-day / date-midpoint aggregates
    "analytics_rfm", "dq_psi_drift", "analytics_survival_km",
    "graph_modularity",
    // bounded 8-row query-panel broadcast (the declared panel nested loop)
    "embed_recall_curve",
    // broadcast 1-row user-total aggregate
    "events_power_curve")

  // stream_* entries execute their streaming query on construction (the
  // memory-sink harness), and the file-watch scan has its own spec —
  // plan shape for streams is pinned in the streaming suites instead.
  private def swept(name: String): Boolean =
    !name.startsWith("stream_") && name != "scan_inventory"

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
    "events_power_curve" -> "running share over the <=31-row active-days histogram")

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
