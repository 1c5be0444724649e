package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executable evidence for the disk-layout claims: the day literal prunes
  * the partitioned scan statically, and the dim-side filter prunes it
  * dynamically through the join (DPP). Values are DuckDB-oracled via
  * `layout_partition_prune` / `layout_dpp_join`; these tests pin the
  * PLANS, which the value gate can't see.
  */
class LayoutSpec extends SparkSpec {

  test("partitioned landing copy: day type-infers to DATE, row-complete") {
    val part = Layout.eventsByDay(spark, sf001)
    assert(part.schema("day").dataType.typeName == "date")
    val n = graft.tables.Tables.events(spark, sf001).count()
    assert(part.count() == n, "partitioned copy must not drop or dup rows")
  }

  test("static pruning: the day literal reaches the scan as a PartitionFilter") {
    val q = Layout.partitionPruneDay(spark, sf001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day predicate must be a partition filter, not a data filter:\n$plan")
    assert(raw"PartitionFilters: \[isnotnull\(day#\d+\), \(day#\d+ = ".r
      .findFirstIn(plan).isDefined,
      s"equality on the partition column must prune statically:\n$plan")
    // the pruned scan must list exactly one day directory (of ~30)
    // sparkPlan (pre-AQE): static pruning is decided at planning time,
    // and the AQE wrapper hides the scan from executedPlan.collectLeaves
    val partitionCounts = q.queryExecution.sparkPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(partitionCounts == Seq(1),
      s"scan must touch one partition, got $partitionCounts")
    val days = q.select("day").distinct().collect().map(_.getString(0))
    assert(days.length == 1, s"exactly one day expected, got ${days.toSeq}")
  }

  test("DPP: the dim filter prunes the fact scan via dynamicpruningexpression") {
    val q = Layout.dppJoin(spark, sf001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruningexpression"),
      s"fact scan must carry a runtime pruning subquery:\n$plan")
    // 7 days survive the dim filter -> 7 result rows (one per day)
    assert(q.count() == 7)
  }

  test("pruned day aggregate equals the unpartitioned computation") {
    val fromLayout = Layout.partitionPruneDay(spark, sf001).collect()
    val ev = graft.tables.Tables.events(spark, sf001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    val day0 = ev.agg(min("day")).head().getString(0)
    val direct = ev.filter(col("day") === day0)
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("event_type").collect()
    assert(fromLayout.toSeq == direct.toSeq)
  }
}
