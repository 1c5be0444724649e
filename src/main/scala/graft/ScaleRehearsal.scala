package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale rehearsal: generate a 10× (sf≈1) corpus from the sf0.1
  * fixtures, run the most expensive entries at both scales, and report
  * per-entry scaling exponents — the measured check on the "survives
  * 100×" design claims (a linear-shaped operator should land near
  * exponent 1.0; super-linear growth flags a pair-space or global-sort
  * leak that small-SF correctness runs can never catch).
  *
  * The 10× corpus is TEN INDEPENDENT SHARDS, not ten copies: every
  * replica r remaps its keys (doc/vec/user/order/part/supp/cust ids
  * offset into disjoint ranges) and — crucially — its VOCABULARY
  * (every document word suffixed `_r`), because verbatim replication
  * would put ten copies of every document into the same shingle/band
  * buckets and blow candidate-pair counts up quadratically: that would
  * measure an artificial 100×-dup corpus, not a 10×-bigger one of the
  * same duplication rate. Dimension tables (region/nation) stay shared,
  * as they would at any scale. Events keep their time range and 10×
  * the users — horizontal growth, the production shape.
  *
  * Usage: `sbt "runMain graft.ScaleRehearsal [gen|run|all]"` — writes
  * `target/sf1/` parquet tables (gitignored) and `BENCH_sf1_partial.json`.
  */
object ScaleRehearsal {

  private val Sf01 = "/root/testdata/sf0.1"
  private val Sf1 = "target/sf1"
  private val Replicas = 10

  /** The audited expensive set: iterative graph ops, the dedup/fuzzy
    * blocking families, windowed events, and the widest aggregates.
    */
  private val Entries = Seq(
    "graph_pagerank", "graph_triangles", "graph_clustering_coeff",
    "graph_label_prop", "graph_bfs_hops", "graph_hits",
    "text_fuzzy_join", "dedup_minhash_pairs", "dedup_clusters_star",
    "cdc_time_travel", "agg_regression_exact", "events_sessions",
    "embed_knn_join", "curation_quantile_norm", "agg_hll_distinct",
    "text_decontaminate_spans",
    // r7 wave: the new iterative / codec / blocking-join entries
    "graph_kcore", "spatial_grid_clusters", "multimodal_phash",
    "incr_cc_merge", "dedup_containment_pairs", "graph_edge_jaccard",
    // r8 wave
    "text_lm_perplexity3", "multimodal_jpeg", "dq_id_gaps",
    "analytics_gini", "graph_components", "graph_adamic_adar",
    "analytics_abc_xyz",
    // r8 waves 6-9: the new iterative / pair-heavy / kernel entries
    "embed_kmeans", "graph_random_walks", "text_lm_kneser_ney",
    "dedup_lsh_calibration", "multimodal_pcm_pitch", "graph_ktruss",
    // r10 wave: all-nodes HyperBall (|E| rows x 256B state per round),
    // the tile codec+hash leg, the verified-pair-table rider, and the
    // bucketed triplet sampler
    "graph_hyperball", "multimodal_tile_dups", "dq_blocking_quality",
    "embed_triplet_audit", "graph_bipartite_project",
    // r11 wave: windowed lexical diversity (lag window over the token
    // stream - must stay linear), the bounded MMR rerank (must stay
    // ~flat: candidate cut is fixed-k), the 33x subsample explode
    // (linear in users x B), context packing (postings join + fixed
    // cut), the two new codec legs (per-item work - linear), and the
    // positional phrase merge (query-sized postings)
    "text_mattr", "embed_mmr_rerank", "analytics_subsample_ci",
    "text_context_pack", "multimodal_edge_energy",
    "multimodal_spectral_flux", "text_phrase_search",
    "text_chunk_overlap", "analytics_mann_whitney",
    // r11 waves 3-4: the experimentation/retrieval singles (one-scan
    // aggregates / fixed cuts - expected flat-to-linear)
    "analytics_did", "analytics_mde", "dq_emd_drift",
    "curation_gate_ablation", "text_hybrid_retrieval",
    // r12 back-fill (r11 verdict item 5): the pre-r10 heavies that
    // predate the "heavy entries join the audited list" rule — the
    // four-banding P/R matrix, its single-banding audit, the
    // cut-ratio conductance sweep, the all-columns null profile, the
    // widest scalar-date entry, and the cluster-fixpoint rider
    "dedup_lsh_pr_matrix", "dedup_minhash_pr_audit", "graph_conductance",
    "dq_null_profile", "date_functions", "curation_soft_dedup_weights",
    // r12 back-fill (r11 advice item 2): the r11 singles with
    // data-sized work that missed the audited set — cuped's user-keyed
    // moment aggregate, the |V|x d posexplode residual scan, and the
    // 5%-trim winsorized means
    "analytics_cuped", "embed_residual_energy", "analytics_winsorized_mean",
    // r12 wave: the multi-layer descent — layer-0 graph build dominates
    // (the X268 bucketed join), upper layers are 1/16 and 1/4 sized, so
    // the exponent must track embed_ann_beam's
    "embed_ann_hnsw",
    // r13: both graph-ANN entries re-audited on the occupancy-bounded
    // build (bits grow log n: sf0.1 stays at 4 bits, sf1 crosses to 7 —
    // the exponent now measures the LINEAR pair-space build; clearAll
    // between runs makes each timed run pay its own graph build), plus
    // the NN-Descent round (two seed builds + the Σ deg² 2-hop join —
    // must stay linear)
    "embed_ann_beam", "embed_knn_descent")

  /** The keyed-state streaming entries: beside runtime, the rehearsal
    * records rows/s and the FINAL state rows/bytes from
    * `lastProgress.stateOperators` at both scales — the check that
    * per-key state is keyed-set sized, not volume sized (stream_hll and
    * stream_cdc_state key on small fixed domains and must hold state
    * ~flat at 10× events; the per-user shapes may grow with the 10×
    * user set but never faster).
    */
  private val StreamEntries = Seq(
    "stream_hll", "stream_cdc_state", "stream_map_state",
    "stream_topk_state", "stream_sessions_state",
    // r9: the band-owner admission gate — state must grow with the
    // admitted-document band set (≈ 4 rows per corpus doc), not volume
    "stream_neardup_gate",
    // r10: the bit-sharded Bloom gate — state must stay ≤ m = 1024 rows
    // FOREVER (growth saturates, the bounded-state contrast to X111)
    "stream_bloom_gate",
    // r11: the pairwise-adjacent max-gap fold — 8 bytes per user, so
    // state rows must track the user set (≤ 10x), never event volume
    "stream_max_gap_state")

  private def replicate(spark: SparkSession, name: String): DataFrame = {
    val base = spark.read.parquet(s"$Sf01/$name.parquet")
    val reps = spark.range(Replicas).select(col("id").cast("int").as("r"))
    val x = base.crossJoin(reps)
    def off(c: String, step: Long) = (col(c) + col("r") * step).as(c)
    name match {
      case "region" | "nation" => base
      case "customer" => x.select(off("c_custkey", 10000000L) +:
        base.columns.filterNot(_ == "c_custkey").map(col): _*)
      case "supplier" => x.select(off("s_suppkey", 10000000L) +:
        base.columns.filterNot(_ == "s_suppkey").map(col): _*)
      case "part" => x.select(off("p_partkey", 10000000L) +:
        base.columns.filterNot(_ == "p_partkey").map(col): _*)
      case "orders" => x.select(Seq(off("o_orderkey", 100000000L),
        off("o_custkey", 10000000L)) ++
        base.columns.filterNot(Set("o_orderkey", "o_custkey")).map(col): _*)
      case "lineitem" => x.select(Seq(off("l_orderkey", 100000000L),
        off("l_partkey", 10000000L), off("l_suppkey", 10000000L)) ++
        base.columns.filterNot(Set("l_orderkey", "l_partkey", "l_suppkey"))
          .map(col): _*)
      case "events" => x.select(Seq(off("event_id", 100000000L),
        off("user_id", 10000000L)) ++
        base.columns.filterNot(Set("event_id", "user_id")).map(col): _*)
      case "documents" =>
        // disjoint per-replica vocabulary: same dup RATE, 10× the corpus
        x.select(off("doc_id", 10000000L),
          expr("array_join(transform(split(text, ' '), " +
            "w -> concat(w, '_', r)), ' ')").as("text"),
          col("lang"), col("source"), col("n_chars"))
      case "embeddings" => x.select(Seq(off("vec_id", 10000000L)) ++
        base.columns.filterNot(_ == "vec_id").map(col): _*)
      case _ => base
    }
  }

  private def gen(spark: SparkSession): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      replicate(spark, t).write.mode("overwrite").parquet(s"$Sf1/$t.parquet")
      println(s"[rehearse] wrote $Sf1/$t.parquet")
    }

  /** The ADVERSARIAL corpus the benign 10× replication cannot produce:
    * the sf1 documents with a deterministic 1% (doc_id % 100 == 7)
    * collapsed onto ONE shared text — a single hot shingle set / md5 /
    * band bucket covering ~500 documents. This is the worst skew a
    * crawl dedup actually meets (boilerplate pages, mirrored dumps):
    * the hot band bucket yields c²/2 ≈ 125k candidate pairs from one
    * key, the case AQE's skew split and the banded join's Σ bucket²
    * bound have to absorb. The rehearsal measures that candidate
    * volume and clustering stay bounded (candidates = hot-cluster c²/2
    * + the benign corpus's own pairs; one giant cluster of exactly the
    * hot docs) — super-linear blowup or a stuck propagation would
    * surface here, not at 100 TB.
    */
  private val SfSkew = "target/sf1skew"
  private val HotText = ("the shared boilerplate page every mirror of the " +
    "dump repeats verbatim across hosts with identical navigation header " +
    "and footer text blocks").trim

  private def genSkew(spark: SparkSession): Unit = {
    val docs = spark.read.parquet(s"$Sf1/documents.parquet")
    docs.withColumn("text",
        when(col("doc_id") % 100 === 7, lit(HotText)).otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$SfSkew/documents.parquet")
    println(s"[rehearse] wrote $SfSkew/documents.parquet")
  }

  private def runSkew(spark: SparkSession): String = {
    val nHot = spark.read.parquet(s"$SfSkew/documents.parquet")
      .filter(col("doc_id") % 100 === 7).count()
    // stage split (r9 self-assessment #1): the shared shingle/signature/
    // prefix memos are built UNTIMED-from-the-pair-pass's-view first and
    // billed to their own stage, so the candidate-generation figure
    // measures the banded join itself, not memo construction
    val tMemo0 = System.nanoTime()
    graft.ext.TextDedup.warmSharedRelations(spark, SfSkew)
    val tMemo = (System.nanoTime() - tMemo0) / 1e9
    val tPairs0 = System.nanoTime()
    val nCand = graft.ext.TextDedup.minhashPairs(spark, SfSkew).count()
    val tPairs = (System.nanoTime() - tPairs0) / 1e9
    val tClust0 = System.nanoTime()
    val clusters = graft.ext.TextDedup.nearDupClustersStar(spark, SfSkew)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"), max("sz").as("max_sz"))
      .collect()(0)
    val tClust = (System.nanoTime() - tClust0) / 1e9
    clearAll(spark)
    println(f"[rehearse] skew: hot=$nHot%d memo=$tMemo%.2fs cand=$nCand%d " +
      f"pairs=$tPairs%.2fs clusters=${clusters.getLong(0)}%d " +
      f"max=${clusters.getLong(1)}%d star=$tClust%.2fs")
    f""" "skew_note": "sf1 corpus with 1%% of docs collapsed onto ONE text (a single hot md5/shingle/band bucket, ~c^2/2 candidate pairs from one key); bounded candidate volume and a converged star-CC with one max-size cluster prove the banded join + contraction absorb adversarial skew. Stages are billed separately: memo_build_s = shared shingle/signature/prefix relations, candidate_s = the banded join + verify alone, star_s = clustering alone",
 "skew_entries": {
  "hot_docs": $nHot%d,
  "memo_build_s": $tMemo%.2f,
  "dedup_minhash_pairs": {"candidate_s": $tPairs%.2f, "n_candidates": $nCand%d},
  "dedup_clusters_star": {"star_s": $tClust%.2f, "n_clusters": ${clusters.getLong(0)}%d, "max_cluster": ${clusters.getLong(1)}%d}
},"""
  }

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def clearAll(spark: SparkSession): Unit = {
    graft.ext.TextDedup.clearCaches(spark)
    graft.ext.Events.clearCaches(spark)
    graft.ext.Similarity.clearCaches(spark)
    graft.ext.Graphs.clearCaches(spark)
    graft.ext.LangModel.clearCaches(spark)
    graft.ext.Sketches.clearCaches(spark)
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 32 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // either events.ts fixture generation (ns-long / µs-NTZ) round-trips
    // through the raw replicate+write; Tables.normalizeTs folds both on read
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (mode == "gen" || mode == "all") gen(spark)
    if (mode == "genskew" || mode == "all") genSkew(spark)
    // `knn` mode: time the graph-ANN INDEX BUILD alone at both scales
    // (r13 self-assessment #5 — the entry exponents fold per-query
    // search overheads into the ratio; this isolates the leg the
    // occupancy-bounded-bits claim is actually about). Writes its own
    // artifact so the main capture's numbers don't churn.
    if (mode == "knn") {
      // untimed warm-up build first: JIT/codegen/first-touch reads
      // dominate a cold session's first build (a cold-first capture
      // read sf0.1 SLOWER than sf1), then best-of-2 per scale
      graft.ext.Similarity.warmKnnGraph(spark, Sf01)
      graft.ext.Similarity.clearCaches(spark)
      val rows = Seq(Sf01, Sf1).map { dir =>
        def once(): (Double, Long) = {
          graft.ext.Similarity.clearCaches(spark)
          val t0 = System.nanoTime()
          val edges = graft.ext.Similarity.warmKnnGraph(spark, dir)
          ((System.nanoTime() - t0) / 1e9, edges)
        }
        val (ta, edges) = once()
        val (tb, _) = once()
        graft.ext.Similarity.clearCaches(spark)
        val t = math.min(ta, tb)
        println(f"[rehearse] knn build $dir%-22s t=$t%7.2fs edges=$edges%d")
        (t, edges)
      }
      val (t01, e01) = rows(0)
      val (t1, e1) = rows(1)
      val exp = math.log(t1 / t01) / math.log(Replicas.toDouble)
      val json =
        f"""{"note": "graph-ANN layer-0 kNN index BUILD alone (no search legs) at sf0.1 vs sf1 - the leg the occupancy-bounded bucket-width claim is about; edge counts confirm the bounded top-m density",
 "knn_build": {"sf01_s": $t01%.2f, "sf1_s": $t1%.2f, "exponent": $exp%.3f, "edges_sf01": $e01%d, "edges_sf1": $e1%d}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_sf1_knn_build.json"), json)
      println("[rehearse] wrote BENCH_sf1_knn_build.json")
    }
    if (mode == "run" || mode == "all") {
      val skewJson =
        if (mode == "all" ||
          java.nio.file.Files.exists(java.nio.file.Paths.get(SfSkew)))
          runSkew(spark) + "\n"
        else ""
      val rows = Entries.map { e =>
        val t01 = time(spark, e, Sf01)
        clearAll(spark)
        val t1 = time(spark, e, Sf1)
        clearAll(spark)
        val exp = math.log(t1 / t01) / math.log(Replicas.toDouble)
        println(f"[rehearse] $e%-28s sf0.1=$t01%7.2fs  sf1=$t1%8.2fs  exponent=$exp%5.2f")
        f"""  "$e": {"sf01_s": $t01%.2f, "sf1_s": $t1%.2f, "exponent": $exp%.3f}"""
      }
      // streaming tier: one untimed warmup pays the state-store /
      // RocksDB session init (the Bench lesson), then each entry is
      // measured at both scales with state size and throughput
      graft.streaming.EventStream.transformStateUserCounts(spark, Sf01).count()
      val streamRows = StreamEntries.map { e =>
        def one(dir: String): (Double, graft.streaming.EventStream.RunStats) = {
          val t = time(spark, e, dir)
          (t, graft.streaming.EventStream.lastRunStats.getOrElse(
            graft.streaming.EventStream.RunStats(0, 0, 0, 0, 0)))
        }
        val (t01, s01) = one(Sf01)
        val (t1, s1) = one(Sf1)
        val exp = math.log(t1 / t01) / math.log(Replicas.toDouble)
        val stateRatio =
          if (s01.stateRows > 0) s1.stateRows.toDouble / s01.stateRows else 0.0
        val rps1 = if (t1 > 0) s1.inputRows / t1 else 0.0
        println(f"[rehearse] $e%-28s sf0.1=$t01%7.2fs  sf1=$t1%8.2fs  " +
          f"exponent=$exp%5.2f  state ${s01.stateRows}%d -> ${s1.stateRows}%d rows " +
          f"(${s1.stateBytes}%d B)  ${rps1}%.0f rows/s")
        f"""  "$e": {"sf01_s": $t01%.2f, "sf1_s": $t1%.2f, "exponent": $exp%.3f, """ +
          s""""state_rows_sf01": ${s01.stateRows}, "state_rows_sf1": ${s1.stateRows}, """ +
          f""""state_growth": $stateRatio%.2f, "state_bytes_sf1": ${s1.stateBytes}, """ +
          f""""rows_per_s_sf1": $rps1%.0f, """ +
          // processing vs wall: the harness share (query start/stop,
          // sink collect, checkpoint plumbing) is wall − triggerExecution
          f""""proc_s_sf01": ${s01.procMs / 1000.0}%.2f, "proc_s_sf1": ${s1.procMs / 1000.0}%.2f}"""
      }
      // pre-signed gate split (r9 self-assessment #2): the from-text
      // gate's per-doc shingle+signature expression work dominates its
      // throughput figure; a production tailer signs upstream. Bill the
      // two stages separately at both scales.
      val preSigned = Seq(Sf01 -> "target/bands_sf01",
        Sf1 -> "target/bands_sf1").map { case (dir, bandsOut) =>
        val tSign0 = System.nanoTime()
        graft.streaming.EventStream.writeBands(spark, dir, bandsOut)
        val tSign = (System.nanoTime() - tSign0) / 1e9
        val tGate0 = System.nanoTime()
        val nRows = graft.streaming.EventStream
          .streamNearDupGatePreSigned(spark, bandsOut).count()
        val tGate = (System.nanoTime() - tGate0) / 1e9
        graft.ext.TextDedup.clearCaches(spark)
        println(f"[rehearse] presigned gate $dir%-14s sign=$tSign%6.2fs " +
          f"gate=$tGate%6.2fs docs=$nRows%d (${nRows / tGate}%.0f docs/s gate-only)")
        (tSign, tGate, nRows)
      }
      val psJson = {
        val (s01, g01, n01) = preSigned(0)
        val (s1, g1, n1) = preSigned(1)
        f""" "presigned_gate_note": "stream_neardup_gate split into its two production stages: sign_s = batch MinHash banding (computed once upstream in a real tailer), gate_s = the keyed-state admission fold alone over the pre-signed rows; the gate-only docs/s is the number the r9 notes undersold",
 "presigned_gate": {
  "sf01": {"sign_s": $s01%.2f, "gate_s": $g01%.2f, "docs": $n01%d, "gate_docs_per_s": ${n01 / g01}%.0f},
  "sf1": {"sign_s": $s1%.2f, "gate_s": $g1%.2f, "docs": $n1%d, "gate_docs_per_s": ${n1 / g1}%.0f}
},"""
      }
      val json =
        s"""{"replicas": $Replicas, "note": "exponent = log10(t_sf1/t_sf0.1); linear work at 10x data with fixed cores lands near 1.0, sublinear means fixed overheads still dominate",
 "cache_state": "rehearsal timings run after per-family shared-relation warmup (same memo regime as Bench's shared_builds) but in a FRESH session with its own JIT/codegen state and NO best-of-2 pass - a rehearsal number is comparable to another rehearsal number, never to bench_detail.json (best-of-2, long-lived warmed session); exponents are the rehearsal's only cross-artifact claim",
$psJson
$skewJson "entries": {
${rows.mkString(",\n")}
},
 "stream_note": "state_growth = final state rows at sf1 / sf0.1 under 10x events+users; keyed-set-sized state grows with its key domain (1.0 for the fixed-domain hll/cdc shapes, <= 10 for per-user shapes), never with row volume",
 "stream_entries": {
${streamRows.mkString(",\n")}
}}"""
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_sf1_partial.json"), json)
      println("[rehearse] wrote BENCH_sf1_partial.json")
    }
    spark.stop()
  }
}
