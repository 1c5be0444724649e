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

  test("z-order: interleave is injective and the bucket summary is complete") {
    val z = Layout.zvalue(graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey", "l_suppkey"))
    // Morton interleave is a bijection (x, y) <-> z on the quantized domain
    val pairs = z.select("x", "y").distinct().count()
    val zs = z.select("zval").distinct().count()
    assert(pairs == zs, s"interleave must be injective: $pairs pairs, $zs zvals")
    // round-trip one value in scala to pin the bit layout (x even bits)
    val row = z.select("x", "y", "zval").head()
    val (x, y, zv) = (row.getLong(0), row.getLong(1), row.getLong(2))
    def unspread(v: Long): Long = {
      var r = 0L
      for (i <- 0 until 16) r |= ((v >> (2 * i)) & 1L) << i
      r
    }
    assert(unspread(zv) == x && unspread(zv >> 1) == y)
    // bucket stats cover every row exactly once
    val total = Layout.zorderBuckets(spark, sf001)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == graft.tables.Tables.lineitem(spark, sf001).count())
  }

  test("z-order interleave round-trips every 16-bit (x, y) sample") {
    import spark.implicits._
    // deterministic pseudo-random 16-bit sample (LCG), plus the corners
    val xs = (0 until 500).map(i => ((i * 48271L) % 65536, (i * 16807L) % 65536)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L))
    val z = Layout.zvalue(xs.toDF("l_partkey", "l_suppkey")
        .withColumn("l_orderkey", lit(0L)))
      .select("x", "y", "zval").collect()
    def unspread(v: Long): Long =
      (0 until 16).map(i => ((v >> (2 * i)) & 1L) << i).reduce(_ | _)
    z.foreach { r =>
      assert(unspread(r.getLong(2)) == r.getLong(0) &&
        unspread(r.getLong(2) >> 1) == r.getLong(1),
        s"round-trip failed for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-order layout: the 2-D box touches fewer files than a linear sort") {
    val zPath = Layout.zorderWritePath(spark, sf001, parts = 8)
    val linPath = graft.tables.Scratch.dir(spark, "graft-lineitem-linear-").toString
    Layout.zvalue(graft.tables.Tables.lineitem(spark, sf001)
        .select("l_orderkey", "l_partkey", "l_suppkey"))
      .repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linPath)
    // a stats-based reader skips a file when its (min,max) envelope
    // misses the box on either dimension — identical decision rule to
    // the oracled bucket summary, applied to the real files
    def touched(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("nx"), max("x").as("xx"),
          min("y").as("ny"), max("y").as("xy"))
        .filter(!(col("xx") < 50 || col("nx") > 150 ||
          col("xy") < 2 || col("ny") > 60))
        .count()
    val (tz, tl) = (touched(zPath), touched(linPath))
    assert(tz < tl,
      s"z-order must touch fewer files for the 2-D box: z=$tz linear=$tl")
  }

  test("bucketed layout: join-side exchanges eliminated; values unchanged") {
    val q = Layout.bucketJoin(spark, sf001)
    val bucketedPlan = q.queryExecution.executedPlan.toString
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val plain = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .hint("SHUFFLE_MERGE")
      .join(graft.tables.Tables.orders(spark, sf001)
          .select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_extendedprice").cast(d2) *
          (lit(1) - col("l_discount").cast(d2)))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
    // shuffle exchanges render as "Exchange hashpartitioning/..." —
    // BroadcastExchange is a different node and must not count
    val shuffleRe =
      "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    def exchanges(p: String): Int = shuffleRe.findAllIn(p).length
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(exchanges(bucketedPlan) < exchanges(plainPlan),
      s"bucketing must remove join-side shuffles: " +
        s"${exchanges(bucketedPlan)} vs ${exchanges(plainPlan)}\n$bucketedPlan")
    // the join itself must carry no exchange under it (only the
    // post-join aggregate may shuffle)
    val joinIdx = bucketedPlan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"bucketed join must stay sort-merge:\n$bucketedPlan")
    assert(shuffleRe.findFirstIn(bucketedPlan.substring(joinIdx)).isEmpty,
      s"no exchange may sit below the bucketed join:\n$bucketedPlan")
    assert(q.collect().toSeq == plain.collect().toSeq)
  }

  test("compaction: file count collapses, ts spans stay disjoint, rows survive") {
    val (frag, compact) = Layout.compactionPaths(spark, sf001)
    def partFiles(p: String): Seq[java.io.File] =
      new java.io.File(p).listFiles().toSeq
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val nFrag = partFiles(frag).size
    val nCompact = partFiles(compact).size
    assert(nFrag >= 32, s"fragmented copy should be many small files, got $nFrag")
    assert(nCompact <= 4, s"compacted copy should be few files, got $nCompact")
    assert(spark.read.parquet(compact).count() ==
      spark.read.parquet(frag).count(), "compaction must not drop/dup rows")
    // range partitioning on ts ⟹ per-file ts spans are pairwise disjoint
    // (the property min/max stats readers skip on)
    val spans = partFiles(compact).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("ts"), max("ts")).head()
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"ts spans overlap across compacted files: $spans")
      case _ => ()
    }
  }

  test("schema evolution: pre-evolution rows surface the added column as NULL") {
    val (v1, v2) = Layout.evolvedSnapshotPaths(spark, sf001)
    val merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
    assert(merged.schema.fieldNames.contains("quality_score"))
    val byGen = merged
      .groupBy((col("doc_id") % 2 === 0).as("is_v1"))
      .agg(count(lit(1)).as("n"), count(col("quality_score")).as("n_scored"))
      .collect().map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byGen(true)._2 == 0, "v1 generation must read NULL quality_score")
    assert(byGen(false)._1 == byGen(false)._2,
      "v2 generation must read every quality_score")
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
