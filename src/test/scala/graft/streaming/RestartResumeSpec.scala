package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The checkpoint-restart entry must be genuinely incremental and
  * exactly-once: run 1 emits a proper non-empty subset, the union is
  * duplicate-free, and the whole thing equals the batch closed-window
  * aggregate (the oracle's statement, asserted here engine-side too).
  */
class RestartResumeSpec extends SparkSpec {

  test("restart resumes from checkpoint: incremental, exactly-once, complete") {
    val out = EventStream.restartResume(spark, sf001)
    val rows = out.collect()
    val run1 = EventStream.restartResumeRun1Rows(spark, sf001)
    assert(run1 > 0, "run 1 must emit some closed windows")
    assert(run1 < rows.length,
      "run 2 must add windows — otherwise the restart wasn't incremental")
    // exactly-once: re-emission across the restart would duplicate keys
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length == keys.length,
      "duplicate (hour_start, event_type) rows: restart reprocessed data")
    // completeness + state recovery: equals the batch closed-window set
    val ev = graft.tables.Tables.events(spark, sf001)
    val mt = ev.agg(max(date_trunc("millisecond", col("ts")))).head().getTimestamp(0)
    val batch = ev
      .withColumn("hour", date_trunc("hour", col("ts")))
      .filter(col("hour") + expr("INTERVAL 1 HOUR") <=
        lit(mt) - expr("INTERVAL 1 HOUR"))
      .groupBy(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy("hour_start", "event_type")
      .collect()
    assert(rows.toSeq == batch.toSeq)
  }
}
