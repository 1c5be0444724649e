package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables

/** Incremental aggregate maintenance (materialized-view merge).
  *
  * The 100 TB pattern: a per-key aggregate over full history is never
  * recomputed from scratch — yesterday's state relation (~|keys| rows)
  * is merged with the delta partition's partial aggregate (one day of
  * data). That only works for algebraic aggregates whose partials
  * compose: count/sum add, min/max combine, avg = sum/count derived at
  * read time. Sums run in DECIMAL so the merge path and a full recompute
  * are bit-identical regardless of partition order (double sums would
  * drift) — which is what lets the DuckDB oracle state the full
  * recompute and still hash-match the merged result.
  */
object Materialize {

  private val D2 = DecimalType(18, 2)

  /** Per-(user, event_type) running stats split at `cutoff`: state =
    * everything before, delta = the new arrivals, merged = groupBy over
    * the union of the two partial relations. Both partials and the merge
    * key on the same (user_id, event_type), so at scale the merge is a
    * co-partitioned aggregate of two key-sized inputs, not a rescan of
    * history.
    */
  def incrAggMerge(spark: SparkSession, dir: String,
                   cutoff: String = "2024-01-20 00:00:00"): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"),
        col("value").cast(D2).as("dval"), unix_micros(col("ts")).as("us"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"), sum("dval").as("sv"),
          min("us").as("mn"), max("us").as("mx"))
    val cut = lit(cutoff).cast("timestamp")
    val state = partial(ev.filter(col("ts") < cut))
    val delta = partial(ev.filter(col("ts") >= cut))
    state.unionByName(delta)
      .groupBy("user_id", "event_type")
      .agg(sum("cnt").as("n_events"),
        sum("sv").cast("double").as("sum_value"),
        min("mn").as("first_us"), max("mx").as("last_us"))
      .withColumn("avg_value",
        round(col("sum_value") / col("n_events"), 6))
      .orderBy("user_id", "event_type")
  }

  /** X73: incremental JOIN-view maintenance — the join generalization of
    * [[incrAggMerge]]: the view is revenue-per-nation over orders ⋈
    * customer, and when a new fact batch Δorders arrives, only
    * Δorders ⋈ customer is computed (ΔV = agg(ΔR ⋈ S) for a static
    * dimension — the standard delta rule; with both sides changing it
    * extends to ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS). The base fact history is never
    * re-joined or re-scanned: its contribution enters as the saved
    * state partials. DECIMAL partials make merged == full recompute
    * bit-identical (the oracle states the full recompute).
    */
  def incrJoinMerge(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(D2).as("price"))
    // the "new batch": every 10th order key — a deterministic stand-in
    // for the latest ingest partition
    val base = o.filter(col("o_orderkey") % 10 =!= 7)
    val delta = o.filter(col("o_orderkey") % 10 === 7)
    def partial(f: DataFrame): DataFrame =
      f.join(c, f("o_custkey") === c("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("cnt"), sum("price").as("rev"))
    partial(base).unionByName(partial(delta))
      .groupBy("c_nationkey")
      .agg(sum("cnt").as("n_orders"),
        sum("rev").cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }
}
