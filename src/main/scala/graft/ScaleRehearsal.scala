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
    "dedup_lsh_calibration", "multimodal_pcm_pitch", "graph_ktruss")

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
    "stream_topk_state", "stream_sessions_state")

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
    if (mode == "run" || mode == "all") {
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
      val json =
        s"""{"replicas": $Replicas, "note": "exponent = log10(t_sf1/t_sf0.1); linear work at 10x data with fixed cores lands near 1.0, sublinear means fixed overheads still dominate",
 "entries": {
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
