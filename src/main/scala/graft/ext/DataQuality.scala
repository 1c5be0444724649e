package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Data-quality expectations — the constraint checks a warehouse engine
  * runs against landed tables (the dbt-test / Delta-constraints analog):
  * referential integrity, key uniqueness, and domain predicates, each
  * expressed as a *violations relation* so failures are inspectable rows,
  * not just a boolean.
  *
  * Scale shape: referential checks are anti-joins (the parent key side
  * broadcasts when dimensional); uniqueness is a keyed count; domain
  * checks are narrow filters. Nothing collects; a report over N checks is
  * a union of N aggregates.
  */
object DataQuality {

  /** Child rows whose key has no match in the parent relation. SQL FK
    * semantics: a NULL child key is not a violation (add a non-null
    * domain check if the key is mandatory) — without the carve-out the
    * anti-join would report every NULL-key row as an orphan while the
    * oracle's NOT IN twin counts none.
    */
  def referentialViolations(child: DataFrame, childKey: String,
                            parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")

  /** Key groups that occur more than once. */
  def uniquenessViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Rows failing an arbitrary domain predicate. */
  def domainViolations(df: DataFrame, predicate: Column): DataFrame =
    df.filter(!predicate)

  private def counted(name: String, violations: DataFrame): DataFrame =
    violations.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))

  /** Volume anomaly detection: per-day event counts z-scored against the
    * whole series (the freshness/volume monitor a landed feed gets).
    * Variance is computed from SUM/SUM-of-squares over INTEGRAL counts —
    * exact in any partition order, so mean/std/z are bit-identical
    * across engines (population variance; sample would just rescale).
    * One tiny aggregate over the per-day relation; the day pre-aggregate
    * is the only corpus-sized shuffle.
    */
  def volumeAnomalies(spark: SparkSession, dir: String,
                      zThreshold: Double = 2.0): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day_num"))
      .groupBy("day_num").agg(count(lit(1)).as("n"))
    val stats = daily.agg(
      count(lit(1)).cast("double").as("n_days"),
      sum("n").cast("double").as("s1"),
      sum(col("n") * col("n")).cast("double").as("s2"))
    daily.crossJoin(broadcast(stats))
      .withColumn("mean", col("s1") / col("n_days"))
      .withColumn("std",
        sqrt(col("s2") / col("n_days") - col("mean") * col("mean")))
      .select(col("day_num"), col("n"),
        round(col("mean"), 6).as("mean_n"),
        round((col("n") - col("mean")) / col("std"), 6).as("z"),
        (abs(col("n") - col("mean")) > col("std") * zThreshold)
          .as("is_anomaly"))
      .orderBy("day_num")
  }

  /** The fixture DQ report: one row per expectation with its violation
    * count — referential integrity across the star schema, key
    * uniqueness, and the domain invariants the analytics queries rely on.
    */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val d = Tables.documents(spark, dir)
    val checks = Seq(
      counted("fk_lineitem_orders",
        referentialViolations(li, "l_orderkey", o, "o_orderkey")),
      counted("fk_orders_customer",
        referentialViolations(o, "o_custkey", c, "c_custkey")),
      counted("fk_supplier_nation",
        referentialViolations(s, "s_nationkey", n, "n_nationkey")),
      counted("unique_orders_key",
        uniquenessViolations(o, Seq("o_orderkey"))),
      // genuinely fails on the driver fixtures (linenumbers repeat within
      // an order) — kept deliberately: a violations report that can say
      // "failed, here's the count" on real data is the point
      counted("unique_lineitem_key",
        uniquenessViolations(li, Seq("l_orderkey", "l_linenumber"))),
      counted("unique_documents_key",
        uniquenessViolations(d, Seq("doc_id"))),
      counted("domain_lineitem_qty_positive",
        domainViolations(li, col("l_quantity") > 0)),
      counted("domain_lineitem_discount_range",
        domainViolations(li,
          col("l_discount") >= 0 && col("l_discount") <= 1)),
      counted("domain_documents_nonempty",
        domainViolations(d, col("n_chars") > 0)))
    checks.reduce(_.unionByName(_)).orderBy("check_name")
  }

  /** X74: replica divergence detection via range fingerprints — the
    * merkle-tree/anti-entropy pattern (Dynamo/Cassandra repair): instead
    * of shipping or row-diffing two 100 TB replicas, each side folds its
    * rows into per-key-range fingerprints (count + XOR of a content
    * hash — commutative, so partition-order-free) and only the ranges
    * whose fingerprints disagree need row-level repair. Two narrow
    * scans, one tiny full-outer join on the range id; the output IS the
    * repair work list. Replica B is a deterministic corruption of A
    * (every 101st doc dropped, every 37th edited) so both divergence
    * kinds are populated at every SF.
    */
  def merkleRanges(spark: SparkSession, dir: String,
                   rangeWidth: Long = 64L): DataFrame = {
    def fingerprint(df: DataFrame): DataFrame =
      df.select(expr(s"doc_id div $rangeWidth").as("seg"),
          conv(substring(md5(concat(col("doc_id").cast("string"), lit("|"),
            col("text"))), 1, 8), 16, 10).cast("long").as("fp"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), bit_xor(col("fp")).as("x"))
    val a = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val b = a.filter(col("doc_id") % 101 =!= 13)
      .select(col("doc_id"),
        when(col("doc_id") % 37 === 5, concat(col("text"), lit(" corrupted")))
          .otherwise(col("text")).as("text"))
    fingerprint(a).withColumnRenamed("n", "n_a").withColumnRenamed("x", "fp_a")
      .join(fingerprint(b).withColumnRenamed("n", "n_b")
        .withColumnRenamed("x", "fp_b"), Seq("seg"), "full_outer")
      .filter(col("n_a").isNull || col("n_b").isNull ||
        col("n_a") =!= col("n_b") || col("fp_a") =!= col("fp_b"))
      .select(col("seg"), col("n_a"), col("n_b"), col("fp_a"), col("fp_b"))
      .orderBy("seg")
  }

  /** X112: per-column completeness/cardinality profile — the
    * schema-driven "describe" a landed feed gets before anything trusts
    * it (null rate, blank rate for strings, exact distinct count). The
    * table is unpivoted ONCE into (column, value-as-string) cells and
    * every per-column statistic comes off that one relation: the
    * null/blank counters are a single map-side-combinable aggregate,
    * and the distinct count is a two-level (column, value) →
    * (column) aggregate — never one `countDistinct` per column, which
    * Catalyst would plan as an expand ×N over the full table. At
    * 100 TB the unpivot is a narrow projection (no shuffle), and both
    * aggregates shuffle only (column, value) pairs — bounded by the
    * actual cardinality, with per-column skew absorbed by the
    * two-level distinct's partial step.
    *
    * Values are profiled in their canonical string form (`CAST(v AS
    * STRING)`), which is also what makes the profile engine-portable:
    * the oracle states the same casts. Timestamps are profiled as
    * epoch-micros so the string form cannot depend on a session zone.
    */
  def nullProfile(spark: SparkSession, dir: String): DataFrame = {
    // unpivot = union of narrow (column, value) projections; Catalyst
    // collapses these into one scan per table with a single Project
    def unpivot(table: String, df: DataFrame,
                cols: Seq[(String, Column)]): DataFrame =
      cols.map { case (n, c) =>
        df.select(lit(table).as("tbl"), lit(n).as("col"),
          c.cast("string").as("v"))
      }.reduce(_.unionByName(_))
    val doc = Tables.documents(spark, dir)
    val ev = Tables.events(spark, dir)
    val cells =
      unpivot("documents", doc, Seq(
        "doc_id" -> col("doc_id"), "text" -> col("text"),
        "lang" -> col("lang"), "source" -> col("source"),
        "n_chars" -> col("n_chars")))
      .unionByName(unpivot("events", ev, Seq(
        "event_id" -> col("event_id"),
        "ts" -> expr("unix_micros(ts)"),
        "user_id" -> col("user_id"), "event_type" -> col("event_type"),
        "value" -> col("value"), "props" -> col("props"))))
    val base = cells.groupBy("tbl", "col").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(col("v").isNotNull && trim(col("v")) === "", 1L)
        .otherwise(0L)).as("n_blank"))
    val distinctCnt = cells.filter(col("v").isNotNull)
      .groupBy("tbl", "col", "v").agg(count(lit(1)).as("dummy"))
      .groupBy("tbl", "col").agg(count(lit(1)).as("n_distinct"))
    base.join(distinctCnt, Seq("tbl", "col"), "left")
      .select(col("tbl"), col("col"), col("n_rows"), col("n_null"),
        col("n_blank"), coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(col("n_null").cast("double") / col("n_rows"), 6)
          .as("null_rate"))
      .orderBy("tbl", "col")
  }

  /** X151: per-column ENTROPY profile — the information-content
    * companion to the X112 null/cardinality profile: Shannon entropy of
    * each column's value distribution, plus the ln(n_distinct) ceiling
    * and the normalized ratio (≈1 = near-uniform key-like column, ≈0 =
    * one dominant value — the "is this column worth indexing /
    * bucketing on" signal). The float discipline is the COUNT-OF-COUNTS
    * trick: H = ln N − (1/N)·Σ_c m_c·c·ln c needs a float sum, which
    * over an unordered value relation would be partition-order-
    * dependent — so values collapse to (count c → #values m_c) first
    * and the sum runs as an ORDERED running window over ascending c
    * (bounded by distinct multiplicities, not values): a fixed
    * summation order, the TWAP/KM rule.
    *
    * Scale shape: one (col, value) count, one (col, c) collapse, then
    * everything is multiplicity-histogram-sized; windows partition per
    * column.
    */
  def entropyProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def unpivot(table: String, df: DataFrame,
                cols: Seq[(String, Column)]): DataFrame =
      cols.map { case (n, c) =>
        df.select(lit(table).as("tbl"), lit(n).as("col"),
          c.cast("string").as("v"))
      }.reduce(_.unionByName(_))
    val cells =
      unpivot("documents", Tables.documents(spark, dir), Seq(
        "lang" -> col("lang"), "source" -> col("source"),
        "n_chars" -> col("n_chars")))
      .unionByName(unpivot("events", Tables.events(spark, dir), Seq(
        "event_type" -> col("event_type"), "user_id" -> col("user_id"))))
      .unionByName(unpivot("orders", Tables.orders(spark, dir), Seq(
        "o_orderpriority" -> col("o_orderpriority"),
        "o_orderstatus" -> col("o_orderstatus"))))
    val vc = cells.filter(col("v").isNotNull)
      .groupBy("tbl", "col", "v").agg(count(lit(1)).as("c"))
    val coc = vc.groupBy("tbl", "col", "c").agg(count(lit(1)).as("m"))
    val ordered = Window.partitionBy("tbl", "col").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = coc
      .withColumn("cum_clnc",
        sum(col("m").cast("double") * col("c") * log(col("c"))).over(ordered))
    withCum.groupBy("tbl", "col")
      .agg(sum(col("c") * col("m")).as("n"),
        sum("m").as("n_distinct"),
        max_by(col("cum_clnc"), col("c")).as("sum_clnc"))
      .select(col("tbl"), col("col"), col("n"), col("n_distinct"),
        round(log(col("n")) - col("sum_clnc") / col("n"), 6).as("entropy"),
        round(log(col("n_distinct")), 6).as("max_entropy"),
        when(col("n_distinct") > 1,
          round((log(col("n")) - col("sum_clnc") / col("n")) /
            log(col("n_distinct")), 6)).as("norm_entropy"))
      .orderBy("tbl", "col")
  }

  /** X139: PSI distribution drift — the ML-monitoring standard
    * (population stability index) between the first and second half of
    * the event stream's date range: per event type, `value` is bucketed
    * into fixed 50-unit bands (exact DECIMAL cents → integer band, 10
    * bands — FIXED bands, not quantiles, so the report is stable across
    * refreshes like the X137 rule thresholds), and each band contributes
    * (p_a − p_b)·ln(p_a/p_b). Bands missing from either period emit a
    * NULL term (the undefined-log guard, stated identically in the
    * oracle) instead of being silently dropped — a feed that GREW a band
    * is exactly what the monitor must surface.
    *
    * Scale shape: one map-side-combinable (type, period, band) count;
    * the period split is a broadcast 1-row midpoint; everything after
    * runs on the 10-band relation. Per-band terms are each a fixed
    * expression (no float re-association); the total PSI is the
    * reader's 10-term sum, deliberately not aggregated here.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_num"),
        expr("least(cast(cast(value as decimal(18,2)) * 100 as bigint) div 5000, " +
          "cast(9 as bigint))").as("band"))
    val mid = ev.agg(expr("(min(day_num) + max(day_num) + 1) div 2").as("mid"))
    val counts = ev.crossJoin(broadcast(mid))
      .withColumn("period", when(col("day_num") < col("mid"), "a")
        .otherwise("b"))
      .groupBy("event_type", "band")
      .agg(sum(when(col("period") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("period") === "b", 1L).otherwise(0L)).as("n_b"))
    val totals = counts.groupBy("event_type")
      .agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
    counts.join(totals, Seq("event_type"))
      .select(col("event_type"), col("band"), col("n_a"), col("n_b"),
        round(col("n_a").cast("double") / col("tot_a"), 6).as("p_a"),
        round(col("n_b").cast("double") / col("tot_b"), 6).as("p_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round((col("n_a").cast("double") / col("tot_a") -
            col("n_b").cast("double") / col("tot_b")) *
            log(col("n_a").cast("double") / col("tot_a") /
              (col("n_b").cast("double") / col("tot_b"))), 6))
          .as("psi_term"))
      .orderBy("event_type", "band")
  }

  /** X134: Benford first-digit audit — the classic landed-financial-feed
    * fraud/fabrication screen: the leading digit of organic magnitudes
    * follows log10(1 + 1/d), and a feed that deviates hard was likely
    * generated or truncated. Digits come from the exact DECIMAL cents
    * rendering (never float formatting); the Benford reference
    * probabilities are 6-dp literal constants stated identically in both
    * engines — no engine computes a transcendental, so the only IEEE op
    * is the one observed-share division and the output hash-oracles.
    * One map-side-combinable 9-group aggregate; nothing else.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val benford = Seq(
      1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
      5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
      9 -> 0.045757)
    val ref = benford.map { case (d, p) =>
      struct(lit(d).as("digit"), lit(p).as("benford_pct"))
    }
    val digits = Tables.orders(spark, dir)
      .select(substring(((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(total))
      .join(spark.range(1).select(explode(array(ref: _*)).as("r"))
        .select(col("r.digit").as("digit"), col("r.benford_pct")),
        Seq("digit"))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("observed_pct"),
        col("benford_pct"),
        round(abs(col("n").cast("double") / col("total") -
          col("benford_pct")), 6).as("abs_diff"))
      .orderBy("digit")
  }

  /** X157: sequence-gap audit (gaps-and-islands) — the missing ranges in
    * an id domain that SHOULD be dense (the "did the loader drop a
    * batch" check): one row per maximal run of id values absent from the
    * fact table's l_orderkey domain. The fixture's orders table is dense
    * 0..N, but ~1.7% of orders never ship a line, so the lineitem FK
    * domain has real holes at every SF — exactly the shape a partial
    * load leaves.
    *
    * Scale shape: the classic LAG-over-everything form forces a GLOBAL
    * sort — a scale-killer on a 100 TB key domain. Here adjacency is
    * computed in two bounded layers instead: keys are RANGE-partitioned
    * (32 ways at fixture scale — the knob is partition count, not data),
    * within-partition adjacency rides a window PARTITIONED by the range
    * bucket (parallel, no global sort), and the only cross-partition
    * work is a window over the 32-row per-bucket (min, max) summary —
    * fixed by partition count, PlanHygiene-allowlisted. Output is
    * identical to the global form regardless of where range boundaries
    * fall: a gap interior to a bucket is found by the bucket's window, a
    * gap spanning a boundary by the summary stitch.
    */
  def idGaps(spark: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("k")).distinct()
      .repartitionByRange(parts, col("k"))
      // materialize the range-partition id as a column: RangePartitioner
      // assigns ascending buckets, so bucket order == key-range order
      .withColumn("pid", spark_partition_id())
    val wIn = Window.partitionBy("pid").orderBy("k")
    val inner = keys
      .withColumn("nk", lead(col("k"), 1).over(wIn))
      .filter(col("nk") - col("k") > 1)
      .select((col("k") + 1).as("gap_start"), (col("nk") - 1).as("gap_end"))
    val summary = keys.groupBy("pid")
      .agg(min("k").as("min_k"), max("k").as("max_k"))
    val wS = Window.orderBy("min_k") // <= `parts` rows, fixed, allowlisted
    val boundary = summary
      .withColumn("next_min", lead(col("min_k"), 1).over(wS))
      .filter(col("next_min") - col("max_k") > 1)
      .select((col("max_k") + 1).as("gap_start"),
        (col("next_min") - 1).as("gap_end"))
    inner.unionByName(boundary)
      .select(col("gap_start"), col("gap_end"),
        (col("gap_end") - col("gap_start") + 1).as("n_missing"))
      .orderBy("gap_start")
  }

  /** X126: referential-integrity audit over the whole star schema — one
    * row per foreign-key edge with both failure directions counted:
    * orphan children (FK value with no parent row — broken loads) and
    * childless parents (dimension rows no fact references — not an
    * error, but the dead weight a retention job wants to know about).
    * This is the relation-shaped "dbt relationships test ×7" a landed
    * warehouse runs after every load.
    *
    * Scale shape: per edge, the fact side collapses to (key, n) by a
    * map-side-combinable aggregate FIRST (bounded by the key domain, not
    * the fact row count), then one full-outer join against the distinct
    * parent key set — dimension sides broadcast when small, and no
    * per-row anti-join ever touches the raw fact table twice. NULL FK
    * values are counted separately (`n_null_child`), not as orphans —
    * SQL FK semantics, same carve-out as [[referentialViolations]].
    */
  def fkOrphanAudit(spark: SparkSession, dir: String): DataFrame = {
    def audit(name: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
      val childAgg = child
        .groupBy(col(childKey).as("key"))
        .agg(count(lit(1)).as("n"))
      // NULL parent keys are excluded on BOTH sides of the twin: the
      // oracle's COUNT(DISTINCT pk) / NOT EXISTS formulations never see
      // a NULL parent, so the distinct key set states the same carve-out
      // here — a dimension row with a NULL key is a load defect for the
      // null-profile entry, not a join endpoint
      val parentKeys = parent.select(col(parentKey).as("key"))
        .filter(col("key").isNotNull).distinct()
        .withColumn("p", lit(1))
      childAgg.join(parentKeys, Seq("key"), "full_outer")
        .agg(
          coalesce(sum("n"), lit(0L)).as("n_child"),
          coalesce(sum(when(col("key").isNull, col("n"))), lit(0L))
            .as("n_null_child"),
          coalesce(sum(when(col("p").isNull && col("key").isNotNull,
            col("n"))), lit(0L)).as("n_orphan_child"),
          sum(when(col("p").isNull && col("key").isNotNull && col("n").isNotNull,
            1L).otherwise(0L)).as("n_orphan_keys"),
          sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_parent"),
          sum(when(col("p").isNotNull && col("n").isNull, 1L).otherwise(0L))
            .as("n_childless_parent"))
        .select(lit(name).as("fk"), col("n_child"), col("n_null_child"),
          col("n_orphan_child"), col("n_orphan_keys"), col("n_parent"),
          col("n_childless_parent"))
    }
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    Seq(
      audit("customer.c_nationkey->nation", cust, "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"),
      audit("lineitem.l_orderkey->orders", li, "l_orderkey",
        ord, "o_orderkey"),
      audit("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"),
      audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
        supp, "s_suppkey"),
      audit("nation.n_regionkey->region", Tables.nation(spark, dir),
        "n_regionkey", Tables.region(spark, dir), "r_regionkey"),
      audit("orders.o_custkey->customer", ord, "o_custkey",
        cust, "c_custkey"),
      audit("supplier.s_nationkey->nation", supp, "s_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .reduce(_.unionByName(_))
      .orderBy("fk")
  }

  /** X170: candidate-key discovery — per column of `orders`, the
    * uniqueness profile (rows, nulls, distinct count, uniqueness ratio)
    * and the `is_key` verdict (distinct == rows AND null-free): the
    * audit that decides which columns can anchor a merge/dedup/SCD key,
    * the companion to X112's null profile and X151's entropy profile.
    * Values are compared as strings only to COUNT them — each engine
    * casts with its own (injective) formatting, so the distinct counts
    * agree without the rendered strings ever being compared.
    *
    * Scale shape: one unpivot (a union of narrow per-column projections
    * Catalyst collapses into a single scan) fanned ×columns, then two
    * map-side-combinable aggregates — the X112 shape; output is
    * column-count-sized.
    */
  def keyCandidates(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val colExprs: Seq[(String, Column)] = Seq(
      "o_orderkey" -> col("o_orderkey"),
      "o_custkey" -> col("o_custkey"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_totalprice" -> col("o_totalprice"),
      "o_orderdate" -> expr("unix_micros(cast(o_orderdate as timestamp))"),
      "o_orderpriority" -> col("o_orderpriority"))
    val cells = colExprs.map { case (n, c) =>
      o.select(lit(n).as("col_name"), c.cast("string").as("v"))
    }.reduce(_.unionByName(_))
    val base = cells.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"))
    val dc = cells.filter(col("v").isNotNull)
      .groupBy("col_name", "v").agg(count(lit(1)).as("c"))
      .groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
    base.join(dc, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(coalesce(col("n_distinct"), lit(0L)).cast("double") /
          col("n_rows").cast("double"), 6).as("uniqueness"),
        (coalesce(col("n_distinct"), lit(0L)) === col("n_rows") &&
          col("n_nulls") === 0).as("is_key"))
      .orderBy("col_name")
  }

  /** X171: declarative cross-field rule audit — a fixed rule catalog
    * evaluated in ONE pass over the (lineitem ⋈ orders) fact relation,
    * each rule a conditional counter: the "business invariant" tier of
    * data quality above X112's structural profile (and on this fixture
    * the cross-table rule R1 genuinely fires — ~49% of lines carry a
    * ship date before their order date, a generator artifact a DQ
    * audit exists to surface). Counts are exact integers; the rate is
    * the one IEEE division.
    *
    * Scale shape: one key-shuffle join (the same orderkey equi-join
    * every TPC-H entry shuffles on), one map-side-combinable aggregate
    * to a SINGLE row of counters, unpivoted to rule-catalog-sized
    * output on the driver-free stack path.
    */
  def ruleViolations(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val joined = li.join(o, Seq("l_orderkey"))
    val agg = joined.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
        .as("r1"),
      sum(when(col("l_discount") > 0.08, 1L).otherwise(0L)).as("r2"),
      sum(when(col("l_quantity") > 45.0, 1L).otherwise(0L)).as("r3"),
      sum(when(col("l_tax") > 0.06, 1L).otherwise(0L)).as("r4"),
      sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
        .as("r5"),
      sum(when(col("l_extendedprice") <= 0.0, 1L).otherwise(0L)).as("r6"))
    // stack over the ONE-row counter relation (a unionByName of
    // per-rule selects would re-run the join+aggregate once per rule)
    agg.select(col("n").as("n_checked"), expr(
        "stack(6, " +
          "'R1', 'ship_before_order', r1, " +
          "'R2', 'discount_over_cap', r2, " +
          "'R3', 'quantity_over_cap', r3, " +
          "'R4', 'tax_over_cap', r4, " +
          "'R5', 'returnflag_domain', r5, " +
          "'R6', 'price_nonpositive', r6) AS (rule_id, rule_name, n_violations)"))
      .select(col("rule_id"), col("rule_name"), col("n_checked"),
        col("n_violations"),
        round(col("n_violations").cast("double") /
          col("n_checked").cast("double"), 6).as("violation_rate"))
      .orderBy("rule_id")
  }

  /** X176: FK inference by containment — the DISCOVERY companion to
    * X126's declared-FK audit: for a catalog of candidate (child →
    * parent) column pairs, measure what fraction of the child's
    * DISTINCT values the parent key set contains and whether the parent
    * column is itself a key; verdict `is_fk` = full containment AND
    * key parent. The catalog includes a negative control (custkey →
    * suppkey) so the audit demonstrably rejects — profile-based FK
    * discovery is exactly this containment test at warehouse scale
    * (the "which column joins to which" question on undocumented data).
    *
    * Scale shape: per candidate, two distinct collapses and one
    * key-keyed LEFT SEMI join over the distinct sets (key-domain-sized,
    * never fact-sized); candidates are a fixed catalog, evaluated
    * independently — trivially parallel.
    */
  def fkInference(spark: SparkSession, dir: String): DataFrame = {
    def side(df: DataFrame, c: String): DataFrame =
      df.select(col(c).as("key")).filter(col("key").isNotNull).distinct()
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val candidates: Seq[(String, DataFrame, DataFrame)] = Seq(
      ("lineitem.l_partkey->part.p_partkey",
        side(li, "l_partkey"), side(Tables.part(spark, dir), "p_partkey")),
      ("lineitem.l_suppkey->supplier.s_suppkey",
        side(li, "l_suppkey"), side(Tables.supplier(spark, dir), "s_suppkey")),
      ("lineitem.l_orderkey->orders.o_orderkey",
        side(li, "l_orderkey"), side(o, "o_orderkey")),
      ("orders.o_custkey->customer.c_custkey",
        side(o, "o_custkey"), side(Tables.customer(spark, dir), "c_custkey")),
      // negative control: same integer domain, no containment relation
      ("orders.o_custkey->supplier.s_suppkey",
        side(o, "o_custkey"), side(Tables.supplier(spark, dir), "s_suppkey")))
    // fully relational per candidate (no driver-side counts): a left
    // join against the distinct parent keys marks containment, one
    // aggregate reduces to the audit row
    candidates.map { case (name, child, parent) =>
      child.join(parent.withColumn("hit", lit(1L)), Seq("key"), "left")
        .agg(count(lit(1)).as("n_child_distinct"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contained"))
        .select(lit(name).as("candidate"),
          col("n_child_distinct"), col("n_contained"),
          round(col("n_contained").cast("double") /
            col("n_child_distinct").cast("double"), 6).as("containment"),
          (col("n_contained") === col("n_child_distinct")).as("is_fk"))
    }.reduce(_.unionByName(_))
      .orderBy("candidate")
  }

  /** X177: freshness audit — per event type, the last-seen timestamp,
    * its lag behind the corpus watermark, trailing-24h volume, and a
    * staleness verdict (lag ≥ 30 minutes): the "is this feed still
    * flowing" check every ingestion dashboard leads with (X28 flags
    * volume anomalies per day; this flags the feed that STOPPED). All
    * integer µs/minute arithmetic against the one-row corpus-max
    * watermark; on this fixture two of five types genuinely trip the
    * threshold, so the verdict column carries signal.
    *
    * Scale shape: one map-combinable per-type aggregate; the watermark
    * is a 1-row broadcast (the declared X137-class nested loop, bound
    * pinned in PlanHygieneSpec).
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
    val wm = ev.agg(max("us").as("wm_us"))
    ev.groupBy("event_type")
      .agg(max("us").as("last_us"), count(lit(1)).as("n_events"))
      .crossJoin(broadcast(wm))
      .withColumn("lag_minutes", expr("(wm_us - last_us) div 60000000"))
      .select(col("event_type"), col("last_us"), col("n_events"),
        col("lag_minutes"), (col("lag_minutes") >= 30).as("is_stale"))
      .orderBy("event_type")
  }

  /** X184: two-sample Kolmogorov–Smirnov drift test — per event type,
    * D = max |F̂_a − F̂_b| between the value distributions of the first
    * and second half of the corpus (the X139 PSI split), the
    * distribution-shape alarm that needs NO banding choice (PSI's
    * bands are a tuning knob; KS is band-free). Entirely integer until
    * the final division: values are exact cents, per-value cumulative
    * counts ride type-partitioned ordered windows, and the max is over
    * the integer cross-product |cumA·nB − cumB·nA| — the significance
    * flag (D > 1.36·√((nA+nB)/(nA·nB)), α≈0.05) is decided by the
    * squared integer comparison in DECIMAL(38,0), so no float ever
    * reaches a verdict.
    *
    * Scale shape: the corpus collapses to the per-(type, cents) count
    * relation (value-histogram-sized); windows are type-partitioned
    * over that histogram; output is type-count rows. The 1-row corpus
    * midpoint is the declared X139-class broadcast.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL values carry no position in an ECDF — excluded on both sides
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_num"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
    val mid = ev.agg(expr("(min(day_num) + max(day_num) + 1) div 2").as("mid"))
    val counts = ev.crossJoin(broadcast(mid))
      .groupBy("event_type", "cents")
      .agg(sum(when(col("day_num") < col("mid"), 1L).otherwise(0L)).as("na"),
        sum(when(col("day_num") >= col("mid"), 1L).otherwise(0L)).as("nb"))
    val w = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tw = Window.partitionBy("event_type")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    counts
      .withColumn("cum_a", sum("na").over(w))
      .withColumn("cum_b", sum("nb").over(w))
      .withColumn("tot_a", sum("na").over(tw))
      .withColumn("tot_b", sum("nb").over(tw))
      .groupBy("event_type")
      .agg(max("tot_a").as("n_a"), max("tot_b").as("n_b"),
        max(abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")))
          .as("d_num"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 6)
          .as("ks_stat"),
        // D² > 1.8496·(nA+nB)/(nA·nB) ⇔ d_num²·10⁴ > 18496·(nA+nB)·nA·nB
        // (decimal × BIGINT products — the X141/X150 proven pattern;
        // decimal × decimal would outgrow DuckDB's precision-38 cap)
        (col("d_num").cast(d38) * col("d_num") * 10000 >
          (col("n_a") + col("n_b")).cast(d38) * 18496 *
            col("n_a") * col("n_b"))
          .as("is_significant"))
      .orderBy("event_type")
  }

  /** X220: functional-dependency discovery — the within-table
    * complement of X176's cross-table FK inference: over a fixed
    * candidate panel A→B, count the determinant values whose B-image
    * is not a single value. A holding FD (zero violating keys) is a
    * normalization/compression lever (B belongs in a dimension keyed
    * by A) and an ingest invariant worth a [[ruleViolations]]-class
    * monitor; the panel deliberately mixes known-holding and
    * known-failing candidates so both verdicts carry signal.
    *
    * Scale shape: each candidate is one (A)-keyed count-distinct
    * aggregate collapsed to a single audit row — map-combinable,
    * catalog-sized output; candidates are independent branches
    * unioned at panel size. (Full FD *search* is exponential in
    * columns; a production profiler sweeps exactly this kind of
    * declared panel per snapshot.)
    */
  /** X233: cross-table money reconciliation — per order, recompute the
    * total as Σ extendedprice·(1−discount)·(1+tax) over its line items
    * (the exact-decimal TPC-H charge discipline: every factor cast to
    * DECIMAL(18,2), the pair product pinned to (18,4) before the third
    * factor) and compare against the header's `o_totalprice`; per
    * order status: order count, exactly-reconciled count, the worst
    * absolute delta and the signed net delta. This is the ledger
    * consistency audit every warehouse runs between a fact table and
    * its rollup header — on this synthetic fixture the headers do NOT
    * reconcile (independent generators), which is exactly what the
    * audit is for: the deltas are the oracled signal.
    *
    * Scale shape: one order-keyed aggregate over lineitem, one
    * broadcast-free equi-join to the header, one status-keyed rollup —
    * all exact DECIMAL until the output casts.
    */
  def moneyReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val D2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val D4 = org.apache.spark.sql.types.DecimalType(18, 4)
    def d2c(c: String) = col(c).cast(D2)
    val charge = (d2c("l_extendedprice") * (lit(1) - d2c("l_discount")))
      .cast(D4) * (lit(1) + d2c("l_tax"))
    val recomputed = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum(charge).as("recomputed"), count(lit(1)).as("n_lines"))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(D2).as("header"))
      .join(recomputed, Seq("o_orderkey"), "left")
      .select(col("o_orderstatus"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        (coalesce(col("recomputed"),
          lit(0).cast(D4)) - col("header")).as("delta"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("n_lines") === 0, 1L).otherwise(0L))
          .as("n_headerless"),
        sum(when(col("delta") === 0, 1L).otherwise(0L)).as("n_reconciled"),
        max(abs(col("delta"))).as("max_abs_delta_d"),
        sum(col("delta")).as("net_delta_d"))
      .select(col("o_orderstatus"), col("n_orders"), col("n_headerless"),
        col("n_reconciled"),
        col("max_abs_delta_d").cast("double").as("max_abs_delta"),
        col("net_delta_d").cast("double").as("net_delta"))
      .orderBy("o_orderstatus")
  }

  def fdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    def fd(tbl: String, df: DataFrame, a: String, b: String): DataFrame =
      df.select(col(a).as("k"), col(b).as("v"))
        .filter(col("k").isNotNull)
        .groupBy("k").agg(countDistinct("v").as("nv"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nv") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
          max("nv").as("max_rhs_per_key"))
        .select(lit(s"$tbl.$a->$b").as("fd"), col("n_keys"),
          col("n_violating_keys"), col("max_rhs_per_key"),
          (col("n_violating_keys") === 0).as("holds"))
    Seq(
      fd("nation", Tables.nation(spark, dir), "n_nationkey", "n_regionkey"),
      fd("nation", Tables.nation(spark, dir), "n_regionkey", "n_name"),
      fd("orders", Tables.orders(spark, dir), "o_orderkey", "o_orderpriority"),
      fd("orders", Tables.orders(spark, dir), "o_custkey", "o_orderstatus"),
      fd("customer", Tables.customer(spark, dir), "c_custkey", "c_mktsegment"),
      fd("customer", Tables.customer(spark, dir), "c_nationkey", "c_mktsegment"),
      fd("documents", Tables.documents(spark, dir), "doc_id", "lang"),
      fd("documents", Tables.documents(spark, dir), "lang", "source"))
      .reduce(_.unionByName(_))
      .orderBy("fd")
  }

  /** X244: entity-resolution blocking-quality audit (Christen 2012's
    * two standard metrics) for the X113 5-word-prefix blocking key:
    *  - reduction ratio = 1 − Σ_b C(n_b,2) / C(n,2) — how much of the
    *    quadratic pair space the blocking prunes (the number that says
    *    whether the ER join is feasible at all at 100 TB);
    *  - pairs completeness = share of VERIFIED near-dup pairs (the
    *    X101 exact-Jaccard relation, ridden as a table — never
    *    re-joined) whose two members land in the same block — the
    *    recall the blocking costs.
    * Both pair counts are pure per-block ARITHMETIC (Σ n_b(n_b−1)/2),
    * never materialized pairs; exact BIGINT until the two rounded
    * divisions.
    *
    * Scale shape: one groupBy(block) count, one doc-keyed equi-join to
    * tag the verified pair table with block ids, three 1-row
    * aggregates. The blocking key itself is narrow per-row string
    * arithmetic at the scan.
    */
  def blockingQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(expr("concat_ws(' ', slice(split(text, ' '), 1, 5))"))
          .as("blk"))
    val blockStats = docs.groupBy("blk").agg(count(lit(1)).as("n_b"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(expr("(n_b * (n_b - 1)) div 2")).as("cand_pairs"))
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = graft.ext.TextDedup.jaccardPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val tagged = pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("blk").as("blk_a")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("blk").as("blk_b")),
        Seq("doc_b"))
      .agg(count(lit(1)).as("verified_pairs"),
        sum(when(col("blk_a") === col("blk_b"), 1L).otherwise(0L))
          .as("pairs_in_block"))
    tot.crossJoin(blockStats).crossJoin(tagged)
      .select(col("n_docs"), col("n_blocks"), col("cand_pairs"),
        expr("(n_docs * (n_docs - 1)) div 2").as("total_pairs"),
        round(lit(1.0) - col("cand_pairs").cast("double") /
          expr("(n_docs * (n_docs - 1)) div 2"), 6).as("reduction_ratio"),
        col("verified_pairs"), col("pairs_in_block"),
        round(col("pairs_in_block").cast("double") / col("verified_pairs"), 6)
          .as("pairs_completeness"))
  }

  /** X291 (r14 decomposition): per-type singleton oracle-environment
    * probes — the final bisection step of the theil/hier_rollup
    * driver-red/mirror-green investigation. The r13 combined probe
    * (`dq_probe_types`: all four suspect types in one relation) came
    * back hash-red in CORRECTNESS_r13, proving the driver's oracle
    * bridge renders at least one of {DECIMAL(9,6), DECIMAL(18,2),
    * DOUBLE} differently from the pinned duckdb 1.0.0 / pandas 2.2.2
    * mirror — but a multi-column red cannot say WHICH. These
    * singletons carry the SAME adversarial literals, one suspect type
    * per entry, so CORRECTNESS_r14's red/green pattern names the exact
    * broken type(s); the BIGINT singleton (certified green three ways
    * by X288/X289/X290) stays as the permanent green control. Reads NO
    * table; values are identical string literals in entry and twin, so
    * any red cell is an oracle-environment property by construction.
    * All literals parse exactly (strings → decimal/int) or correctly
    * rounded (strings → nearest double, identical in every IEEE parse).
    */
  private def probeLiterals(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "-0.123450", "1234567890123456.78", 42L, "0.1"),
      (2L, "0.000000", "0.00", 0L, "-2.5"),
      (3L, "0.999999", "-9.99", -7L, "123456.789012"),
      (4L, "-0.100000", "100.10", 9007199254740993L, "0.0000001"))
      .toDF("probe_id", "d96", "d182", "i64", "f64")
  }

  /** BIGINT bridge control (incl. 2⁵³+1, unrepresentable in float64). */
  def probeInt64(spark: SparkSession): DataFrame =
    probeLiterals(spark)
      .select(col("probe_id"), col("i64").as("int64"))
      .orderBy("probe_id")

  /** DECIMAL(9,6) bridge probe — negative 6dp, trailing-zero, zero. */
  def probeDec96(spark: SparkSession): DataFrame =
    probeLiterals(spark)
      .select(col("probe_id"),
        col("d96").cast("decimal(9,6)").as("dec96"))
      .orderBy("probe_id")

  /** DECIMAL(18,2) bridge probe — incl. the 18-significant-digit value
    * (1234567890123456.78) that float64 cannot represent, the exact
    * shape the CLAUDE.md p>18 lint rationale warns about, here AT p=18.
    */
  def probeDec182(spark: SparkSession): DataFrame =
    probeLiterals(spark)
      .select(col("probe_id"),
        col("d182").cast("decimal(18,2)").as("dec182"))
      .orderBy("probe_id")

  /** DOUBLE bridge probe — non-dyadic 0.1, sub-epsilon 1e-7, negatives. */
  def probeDouble(spark: SparkSession): DataFrame =
    probeLiterals(spark)
      .select(col("probe_id"),
        col("f64").cast("double").as("float64"))
      .orderBy("probe_id")

  /** X291 original combined probe — all four suspect types in one
    * relation, exactly the r13 shape. Kept alongside the singletons
    * because the driver's surface is append-only: an entry name that
    * existed in CORRECTNESS_r13 must keep existing (a disappeared
    * query reads as a regression regardless of why). Its red cell
    * stays the documented r13 diagnostic; the singletons above carry
    * the bisection forward.
    */
  def probeTypes(spark: SparkSession): DataFrame =
    probeLiterals(spark)
      .select(col("probe_id"),
        col("d96").cast("decimal(9,6)").as("dec96"),
        col("d182").cast("decimal(18,2)").as("dec182"),
        col("i64").as("int64"),
        col("f64").cast("double").as("float64"))
      .orderBy("probe_id")
}
