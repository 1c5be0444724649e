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
}
