package graft.ext

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.{Scratch, Tables}

/** Disk-layout operators: the day-partitioned event landing zone and the
  * two read patterns that justify it at scale — static partition pruning
  * (a literal day predicate prunes the scan to one directory) and dynamic
  * partition pruning (a selective dimension filter prunes the fact scan at
  * runtime through the join, the mechanism that makes star-schema joins
  * over a 100 TB partitioned fact viable; Spark plans it as a
  * `dynamicpruningexpression` subquery on the fact scan).
  *
  * The reference lands its snapshots as flat per-run files
  * (DataWarehouse.js:673-704 writes one JSON per scan); a Spark-native
  * warehouse lands them partitioned by the dominant access predicate so
  * queries touch only the partitions they name. Both plans are asserted
  * in `LayoutSpec`; result values are DuckDB-oracled
  * (`layout_partition_prune`, `layout_dpp_join`).
  */
object Layout {

  /** One day-partitioned copy per (application, fixture dir), written to
    * managed scratch — the write is the "landing" half of the operator
    * and costs one shuffle-free pass over events (`partitionBy` splits
    * writer-side). Partition values like `2024-01-01` type-infer to DATE
    * on read; queries filter on that native type (so pruning stays on
    * the partition column) and emit `date_format` strings for the
    * engine-portable oracle comparison.
    */
  private val pathCache = TrieMap.empty[(String, String), String]

  def eventsByDayPath(spark: SparkSession, dir: String): String =
    pathCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val out = Scratch.dir(spark, "graft-events-by-day-").toString
      Tables.events(spark, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .write.mode("overwrite").partitionBy("day").parquet(out)
      out
    })

  def eventsByDay(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(eventsByDayPath(spark, dir))

  /** Planning-time query parameters: the first partition day and the
    * 7th-in-order day (the "first week" upper bound), derived once per
    * (application, dir) with one tiny aggregate over the partitioned
    * table. This is parameter derivation — the literals then drive
    * statically-pruned plans — not a data-path collect.
    */
  private val dayBoundsCache = TrieMap.empty[(String, String), (String, String)]

  private def dayBounds(spark: SparkSession, dir: String): (String, String) =
    dayBoundsCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val days = eventsByDay(spark, dir).select("day").distinct()
        .orderBy("day").limit(7).agg(min("day"), max("day")).head()
      (days.getDate(0).toString, days.getDate(1).toString)
    })

  /** Static partition pruning: aggregate exactly one day of the
    * partitioned fact. The day literal reaches the scan as a
    * PartitionFilter, so of N day directories exactly one is listed and
    * read — at 100 TB with daily partitions this is the difference
    * between scanning 1/30th of the table and all of it.
    */
  def partitionPruneDay(spark: SparkSession, dir: String): DataFrame = {
    val (day0, _) = dayBounds(spark, dir)
    eventsByDay(spark, dir)
      .filter(col("day") === lit(day0))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("event_type")
  }

  /** Z-order (Morton) clustering: interleave the bits of two quantized
    * dimensions so range-bucketing the single z key co-locates rows that
    * are close in BOTH dimensions — per-file min/max stats then skip for
    * 2-D box predicates, where a linear sort only ever skips on its
    * leading column. The interleave is the standard magic-number bit
    * spread, written as a chain of `&`/`|`/`<<` columns that both engines
    * evaluate identically on BIGINT (no floats anywhere).
    *
    * The oracled entry reports per-z-bucket stats (bucket = z >> 10,
    * i.e. 1024-z-value virtual "files" — 7 buckets at sf0.001, ~250 at
    * sf0.01) plus the skipped flag for a fixed box query — exactly the
    * pruning decision a file-stats reader would make. `LayoutSpec`
    * additionally writes a real z-sorted parquet copy via
    * [[zorderWritePath]] and asserts the box query reads fewer
    * row-groups/files than a linearly-laid-out copy.
    */
  def zorderBuckets(spark: SparkSession, dir: String): DataFrame = {
    val z = zvalue(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
    // fixed box query, chosen to overlap the key range at every fixture SF
    val (xLo, xHi, yLo, yHi) = (50L, 150L, 2L, 60L)
    z.withColumn("bucket", expr("zval >> 10"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .withColumn("skipped",
        col("max_x") < xLo || col("min_x") > xHi ||
          col("max_y") < yLo || col("min_y") > yHi)
      .orderBy("bucket")
  }

  /** (x, y, zval) for lineitem rows: 16-bit quantized part/supp keys,
    * Morton-interleaved into one 32-bit key. Shared by the oracled bucket
    * summary and the physical-layout spec.
    */
  def zvalue(df: DataFrame): DataFrame = {
    def spread(in: String, out: String)(d: DataFrame): DataFrame = d
      .withColumn(s"${out}_a", expr(s"($in | ($in << 8)) & 16711935"))
      .withColumn(s"${out}_b", expr(s"(${out}_a | (${out}_a << 4)) & 252645135"))
      .withColumn(s"${out}_c", expr(s"(${out}_b | (${out}_b << 2)) & 858993459"))
      .withColumn(out, expr(s"(${out}_c | (${out}_c << 1)) & 1431655765"))
      .drop(s"${out}_a", s"${out}_b", s"${out}_c")
    val quantized = df
      .withColumn("x", col("l_partkey") % 65536)
      .withColumn("y", col("l_suppkey") % 65536)
    spread("y", "sy")(spread("x", "sx")(quantized))
      .withColumn("zval", expr("sx | (sy << 1)"))
      .drop("sx", "sy")
  }

  /** A z-sorted parquet copy (repartitionByRange on zval then
    * sortWithinPartitions) — the physical half [[zorderBuckets]] models;
    * written once per (application, dir) to managed scratch.
    */
  private val zPathCache = TrieMap.empty[(String, String), String]

  def zorderWritePath(spark: SparkSession, dir: String, parts: Int = 16): String =
    zPathCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val out = Scratch.dir(spark, "graft-lineitem-zorder-").toString
      zvalue(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(parts, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(out)
      out
    })

  /** Bucketed co-located join: both fact tables land bucketed (and
    * per-bucket sorted) on the join key, so the join's distribution
    * requirement is satisfied BY THE LAYOUT — no exchange on either side
    * at read time, which at 100 TB converts the dominant recurring join
    * of a warehouse into a zero-shuffle sort-merge. The write
    * repartitions each side to exactly `buckets` hash partitions first so
    * every bucket is a single sorted file (the layout Spark's reader
    * trusts for both distribution AND order).
    *
    * `LayoutSpec` asserts the bucketed plan carries strictly fewer
    * exchanges than the identical unbucketed join; the oracled entry
    * (`layout_bucket_join`) states the plain join — layout never changes
    * values.
    */
  private val bucketDbCache = TrieMap.empty[(String, String), String]

  def bucketedDb(spark: SparkSession, dir: String, buckets: Int = 8): String =
    bucketDbCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val db = "graft_b_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      val loc = Scratch.dir(spark, "graft-bucketed-").toString
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
      Tables.orders(spark, dir)
        .repartition(buckets, col("o_orderkey"))
        .write.format("parquet")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_bucketed")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(buckets, col("l_orderkey"))
        .write.format("parquet")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_bucketed")
      db
    })

  /** Revenue per priority over the bucketed tables — value-identical to
    * the plain join; the exchanges the layout removed are the point.
    */
  def bucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val db = bucketedDb(spark, dir)
    val o = spark.table(s"$db.orders_bucketed")
      .select("o_orderkey", "o_orderpriority")
    val l = spark.table(s"$db.lineitem_bucketed")
    val d2 = (c: String) => col(c).cast(DecimalType(18, 2))
    // SHUFFLE_MERGE pins the sort-merge path (the 100 TB shape this
    // layout serves) so the zero-exchange property is what's asserted,
    // not an AQE broadcast that would hide it at fixture scale
    l.hint("SHUFFLE_MERGE").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(d2("l_extendedprice") * (lit(1) - d2("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Two document snapshots with EVOLVED schemas, landed to scratch: v1
    * is the original narrow shape, v2 (a later ingest generation) adds a
    * `quality_score` column. One path pair per (application, dir).
    */
  private val evoPathCache = TrieMap.empty[(String, String), (String, String)]

  def evolvedSnapshotPaths(spark: SparkSession, dir: String): (String, String) =
    evoPathCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val v1 = Scratch.dir(spark, "graft-docs-v1-").toString
      val v2 = Scratch.dir(spark, "graft-docs-v2-").toString
      val docs = Tables.documents(spark, dir)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(v1)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("n_chars") % 100).as("quality_score"))
        .write.mode("overwrite").parquet(v2)
      (v1, v2)
    })

  /** Schema evolution on read: the two snapshot generations are scanned
    * as ONE table via `mergeSchema` — Parquet footers are reconciled at
    * planning time, rows from the pre-evolution generation surface the
    * added column as NULL. This is how a 100 TB landing zone absorbs a
    * producer-side schema change without rewriting history; the oracle
    * states the same union with an explicit NULL literal. The aggregate
    * observes both generations (n vs n_scored).
    */
  def schemaEvolutionRead(spark: SparkSession, dir: String): DataFrame = {
    val (v1, v2) = evolvedSnapshotPaths(spark, dir)
    spark.read.option("mergeSchema", "true").parquet(v1, v2)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        count(col("quality_score")).as("n_scored"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("quality_score")).as("sum_score"))
      .orderBy("lang")
  }

  /** A deliberately fragmented landing copy of events (64 shuffle-split
    * files at fixture scale — the "small files problem" a streaming or
    * per-batch writer accretes), then its compaction: repartitionByRange
    * on the dominant read key down to a handful of ts-sorted,
    * size-targeted files. Compaction is pure layout — the oracled entry
    * re-aggregates the COMPACTED copy and must equal SQL over the
    * original table; LayoutSpec asserts the file count actually dropped
    * and per-file ts ranges don't overlap (the clustering a ts-predicate
    * reader skips on).
    */
  private val compactCache = TrieMap.empty[(String, String), (String, String)]

  def compactionPaths(spark: SparkSession, dir: String): (String, String) =
    compactCache.getOrElseUpdate((spark.sparkContext.applicationId, dir), {
      val frag = Scratch.dir(spark, "graft-events-frag-").toString
      val compact = Scratch.dir(spark, "graft-events-compact-").toString
      Tables.events(spark, dir).repartition(64)
        .write.mode("overwrite").parquet(frag)
      // target ~4 size-balanced, ts-clustered files: range partitioning
      // keeps each output file a disjoint ts span (stats-skippable);
      // at real scale the partition count derives from bytes/target-size
      spark.read.parquet(frag)
        .repartitionByRange(4, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(compact)
      (frag, compact)
    })

  def compactionQuery(spark: SparkSession, dir: String): DataFrame = {
    val (_, compact) = compactionPaths(spark, dir)
    spark.read.parquet(compact)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("n_users"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy("event_type")
  }

  /** Dynamic partition pruning: the day predicate sits on a calendar
    * dimension, not on the fact, so static pruning can't apply — Spark
    * broadcasts the filtered dim and injects its day set into the fact
    * scan as a runtime `dynamicpruningexpression`, reading only the
    * first week's partitions. The dim here derives from the fact's own
    * partition listing (a stand-in for the date dimension a warehouse
    * would join); the mechanism is identical.
    */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    val (_, day6) = dayBounds(spark, dir)
    val fact = eventsByDay(spark, dir)
    val cal = fact.select("day").distinct().filter(col("day") <= lit(day6))
    fact.join(broadcast(cal), Seq("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("sum_value"), col("n_users"))
      .orderBy("day")
  }

  /** X198: clustering-depth audit — the file-overlap metric a lakehouse
    * OPTIMIZE/Z-ORDER decision is made from (Delta's `clusteringDepth`,
    * Iceberg's overlap metrics): per file, the [min, max] range of the
    * pruning key; a file's DEPTH is how many files' ranges intersect
    * its own (itself included — a perfectly clustered layout has depth
    * 1 everywhere, and a range-pruned query must open `depth` files
    * per key). Two modelled layouts over the same rows make the metric
    * discriminate: `sorted` files cut on key order (depth stays 1–2),
    * `roundrobin` files stripe on a hash residue (every file spans the
    * whole key domain — depth = n_files, the re-cluster trigger).
    *
    * Scale shape: rows collapse to one (file, min, max) summary per
    * file in a single map-combinable aggregate; the overlap join runs
    * on file-count-sized relations (≤ a few thousand summaries per
    * partition at 100 TB — metadata scale, the same rows the manifest
    * already stores), never on data rows. Intersection is the standard
    * half-open interval test, all integer comparisons.
    */
  def clusteringDepth(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k"))
    val files = li.select(lit("sorted").as("layout"),
        expr("k div 2000").as("file_id"), col("k"))
      .unionByName(li.select(lit("roundrobin").as("layout"),
        (col("k") % 7L).as("file_id"), col("k")))
      .groupBy("layout", "file_id")
      .agg(count(lit(1)).as("n_rows"), min("k").as("lo"), max("k").as("hi"))
    val a = files.select(col("layout"), col("file_id"),
      col("lo"), col("hi"))
    val b = files.select(col("layout"), col("file_id").as("file_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    val depth = a.join(b, Seq("layout"))
      .filter(col("lo") <= col("hi_b") && col("lo_b") <= col("hi"))
      .groupBy("layout", "file_id").agg(count(lit(1)).as("depth"))
    files.join(depth, Seq("layout", "file_id"))
      .groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        max("depth").as("max_depth"),
        round(sum("depth").cast("double") / count(lit(1)), 6)
          .as("avg_depth"),
        // well-clustered iff no file overlaps more than 2 others:
        // max_depth <= 3 (integer decision, no ratio)
        (max("depth") <= 3).as("well_clustered"))
      .orderBy("layout")
  }
}
