package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Row-level warehouse maintenance operators: MERGE (upsert) and CDC
  * changelog compaction — the two mutations a lakehouse table sees between
  * full rewrites. The reference applies its row mutations one HTTP call at
  * a time (DataWarehouse.js:297,357,381 — POST/PATCH per record); at
  * warehouse scale the same intent is a *relational* merge of an action
  * set into a keyed base, computed in one co-partitioned pass.
  *
  * Both operators are pure DataFrame → DataFrame (the "apply" is the
  * returned post-image, which a sink then lands), so the DuckDB oracle can
  * state them directly.
  */
object Warehouse {

  private val D2 = DecimalType(18, 2)

  /** The keyed base snapshot: customers as (key, name, bal). Money math
    * runs in DECIMAL so update arithmetic is bit-identical across engines.
    */
  private def baseCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("key"),
      col("c_name").as("name"),
      col("c_acctbal").cast(D2).as("bal"))

  /** The deterministic change set: one op per key (delete beats update
    * when both residues hit), plus inserts on disjoint keys (+1e6 offset
    * guarantees NOT MATCHED). Derived from the base itself so every MERGE
    * branch is populated at every fixture SF.
    */
  def customerChanges(spark: SparkSession, dir: String): DataFrame = {
    val base = baseCustomers(spark, dir)
    val mods = base
      .withColumn("op",
        when(col("key") % 7 === 3, "D").when(col("key") % 5 === 0, "U"))
      .filter(col("op").isNotNull)
      .select(col("key"),
        concat(col("name"), lit(" (updated)")).as("u_name"),
        (col("bal") + lit(100).cast(D2)).as("u_bal"),
        col("op"))
    val ins = base.filter(col("key") % 11 === 4)
      .select((col("key") + 1000000L).as("key"),
        concat(lit("New "), col("name")).as("u_name"),
        lit(0).cast(D2).as("u_bal"),
        lit("I").as("op"))
    mods.unionByName(ins)
  }

  /** MERGE INTO base USING changes ON key: WHEN MATCHED AND op='U' →
    * update, WHEN MATCHED AND op='D' → delete, WHEN NOT MATCHED AND
    * op='I' → insert. Any other combination is a no-op per ANSI MERGE:
    * a MATCHED row whose op is 'I' keeps the base row (it does NOT
    * overwrite), and an unmatched 'U'/'D' touches nothing.
    *
    * Contract (as in SQL MERGE, where a multiply-matched target row is a
    * runtime error): `changes` must carry at most one row per key.
    * Duplicate change keys would fan out through the equi-join and yield
    * one output row per duplicate; callers own that dedup because
    * asserting it here would cost an extra aggregate pass over the
    * change set on every merge.
    *
    * Expressed as ONE full-outer equi-join on the key + branch
    * projection — the co-partitioned single-shuffle plan. At 100 TB the
    * base side is bucketed/partitioned on the key so the recurring merge
    * shuffles only the (small) change set; nothing here is driver-side
    * row-at-a-time.
    */
  def mergeUpsert(base: DataFrame, changes: DataFrame): DataFrame = {
    // Presence markers survive the full-outer join where natural columns
    // could be legitimately NULL on a present side.
    val b = base.withColumn("_base", lit(true))
    val c = changes.withColumn("_chg", lit(true))
    val matched = col("_base").isNotNull && col("_chg").isNotNull
    val action = when(matched && col("op") === "U", "updated")
      .when(matched && col("op") === "D", "deleted")
      .when(col("_base").isNull && col("op") === "I", "inserted")
      .when(col("_base").isNotNull, "kept") // incl. matched+'I' fall-through
    // NULL action = change-only 'U'/'D' (no target row): no-op, dropped.
    b.join(c, Seq("key"), "full_outer")
      .withColumn("action", action)
      .filter(col("action").isNotNull && col("action") =!= "deleted")
      .select(
        col("key"),
        when(col("action").isin("updated", "inserted"), col("u_name"))
          .otherwise(col("name")).as("name"),
        when(col("action").isin("updated", "inserted"), col("u_bal"))
          .otherwise(col("bal")).cast("double").as("bal"),
        col("action"))
  }

  /** The oracled fixture instantiation of [[mergeUpsert]]. */
  def mergeUpsertQuery(spark: SparkSession, dir: String): DataFrame =
    mergeUpsert(baseCustomers(spark, dir), customerChanges(spark, dir))
      .orderBy("key")

  /** A deterministic CDC changelog over a small key space: `seq` is the
    * total commit order, each record an Insert/Update/Delete of one key.
    * Keys cycle mod 97 so every key sees several ops (including
    * delete-then-reinsert resurrections) at every fixture SF.
    */
  def docChangelog(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("seq"),
      (col("doc_id") % 97).as("key"),
      when(col("doc_id") % 11 === 7, "D")
        .when(col("doc_id") % 3 === 0, "I")
        .otherwise("U").as("op"),
      col("n_chars").as("val"),
      col("lang"))

  /** CDC changelog compaction (Debezium-snapshot shape): the table's
    * post-image is, per key, the payload of the LAST op in commit order —
    * absent if that op is a delete. One window over (key ORDER BY seq
    * DESC) = one shuffle on the key; per-key op counts ride along from
    * the same window pass. At scale this is the standard log→snapshot
    * materialization; the key shuffle is unavoidable unless the log is
    * already bucketed by key, and AQE skew-split handles hot keys.
    */
  def cdcApply(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(col("seq").desc)
    changelog
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy("key")))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key"), col("val"), col("lang"),
        col("op").as("last_op"), col("n_ops"))
  }

  /** The oracled fixture instantiation of [[cdcApply]]. */
  def cdcApplyQuery(spark: SparkSession, dir: String): DataFrame =
    cdcApply(docChangelog(spark, dir)).orderBy("key")

  /** X155: SCD Type-2 dimension build — the OTHER standard consumption
    * of a CDC changelog beside the X32 snapshot: instead of keeping only
    * each key's last image, keep EVERY image as a versioned row with
    * validity bounds. Each non-delete op opens a version valid from its
    * own `seq` until the key's next op (any type — an update supersedes,
    * a delete closes); the key's final op, if not a delete, is the
    * current row (`valid_to` NULL, `is_current` true). Deletes
    * themselves emit no row — they only close the predecessor, which is
    * exactly how a warehouse dimension records a retired entity.
    *
    * Scale shape: ONE window over (key ORDER BY seq) — a single shuffle
    * on the dimension key, the same partitioning [[cdcApply]] uses (on a
    * key-bucketed log layout neither op re-shuffles); output is
    * log-sized, never key×version materialized twice. AQE skew-split
    * owns hot keys.
    */
  def scd2Build(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("seq")
    changelog
      .withColumn("valid_to", lead(col("seq"), 1).over(w))
      .filter(col("op") =!= "D")
      .select(col("key"), col("val"), col("lang"),
        col("seq").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Oracled fixture instantiation of [[scd2Build]]. */
  def scd2BuildQuery(spark: SparkSession, dir: String): DataFrame =
    scd2Build(docChangelog(spark, dir)).orderBy("key", "valid_from")

  /** X162: INCREMENTAL SCD2 merge — apply a changelog DELTA to an
    * already-built SCD2 dimension without touching closed history
    * (the production shape: the nightly merge reads yesterday's
    * dimension + today's log tail, never the full log). Three legs:
    * closed base versions pass through untouched; each key's OPEN base
    * version is closed by the key's first delta op; the delta itself
    * builds its own version chain via [[scd2Build]]. Row-identical to
    * rebuilding from the full log — the same delta-equals-rebuild
    * contract as X129's incremental clustering, stated by sharing the
    * full-rebuild oracle verbatim AND asserted directly in the spec.
    *
    * Scale shape: one key-shuffle on the (small) delta for its chain +
    * first-op aggregate, one key join against the dimension (bucketed
    * by key in a real layout → zero exchange); history rows stream
    * through with no window over them.
    */
  def scd2Merge(base: DataFrame, delta: DataFrame): DataFrame = {
    val firstDelta = delta.groupBy("key").agg(min("seq").as("first_seq"))
    val rebased = base.join(firstDelta, Seq("key"), "left")
      .select(col("key"), col("val"), col("lang"), col("valid_from"),
        when(col("is_current") && col("first_seq").isNotNull,
          col("first_seq")).otherwise(col("valid_to")).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
    rebased.unionByName(scd2Build(delta))
  }

  /** Oracled instantiation of [[scd2Merge]]: the log splits at half its
    * seq domain (a broadcast 1-row cut, the cdc_time_travel shape) into
    * the "existing dimension" prefix and the "new arrivals" delta.
    * Shares `warehouse_scd2_build`'s oracle verbatim — equality with
    * the from-scratch build IS the correctness statement.
    */
  def scd2MergeQuery(spark: SparkSession, dir: String): DataFrame = {
    val log = docChangelog(spark, dir)
    val cut = log.agg((max(col("seq")) / 2).cast("long").as("cut"))
    val tagged = log.crossJoin(broadcast(cut))
    scd2Merge(
      scd2Build(tagged.filter(col("seq") <= col("cut")).drop("cut")),
      tagged.filter(col("seq") > col("cut")).drop("cut"))
      .orderBy("key", "valid_from")
  }

  /** X65: time travel — reconstruct the table AS OF an arbitrary commit
    * `asOfSeq` from the same changelog, i.e. [[cdcApply]] parameterized
    * by version. The filter `seq <= asOfSeq` lands BEFORE the key
    * shuffle (and, on a seq-partitioned log layout, prunes whole
    * partitions at the scan — the lakehouse time-travel read path), so
    * reconstructing an old version costs the prefix of the log, never
    * the whole of it. Everything after the cut is identical machinery
    * to the snapshot compaction.
    */
  def cdcTimeTravel(changelog: DataFrame, asOfSeq: Long): DataFrame =
    cdcApply(changelog.filter(col("seq") <= asOfSeq))

  /** Oracled instantiation of [[cdcTimeTravel]]: three version cuts
    * (25% / 50% / 75% of the fixture's seq domain) stacked with a
    * version tag, so the entry certifies reconstruction at several
    * points in history in one relation. The cuts are derived from the
    * fixture's max doc_id (a broadcast 1-row aggregate, no driver
    * scalar).
    */
  def cdcTimeTravelQuery(spark: SparkSession, dir: String): DataFrame = {
    val log = docChangelog(spark, dir)
    val cuts = log.agg(max(col("seq")).as("mx"))
      .select(explode(array(lit(1L), lit(2L), lit(3L))).as("ver"),
        col("mx"))
      .select(col("ver"), expr("(mx * ver) div 4").as("cut"))
    // per-version reconstruction: join the log prefix to each cut, then
    // the same last-op-per-(ver, key) window as cdcApply
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("ver", "key").orderBy(col("seq").desc)
    log.crossJoin(broadcast(cuts))
      .filter(col("seq") <= col("cut"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy("ver", "key")))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("ver"), col("key"), col("val"), col("lang"),
        col("op").as("last_op"), col("n_ops"))
      .orderBy("ver", "key")
  }

  /** X133: BITEMPORAL query — the 2-D extension of X65's time travel:
    * every changelog op records, at TRANSACTION time `seq`, a fact
    * effective from VALID time `eff` (a business-effective day the op
    * carries; derived `seq % 50` on the fixture). "As of transaction T,
    * what did we believe held at valid time V?" is then, per key, the op
    * maximizing (eff, seq) among {seq ≤ T, eff ≤ V} — retroactive
    * corrections (later seq, earlier eff) resolve exactly the way a
    * restated financial ledger requires, and a 'D' winner is a
    * tombstone: the key did not exist at that coordinate. The entry
    * answers a 2×2 (T, V) grid in one relation, cuts derived plan-side
    * from the max seq (broadcast 1-row aggregate).
    *
    * Scale shape: the `seq ≤ T` cut lands before the key shuffle (on a
    * seq-partitioned log layout it prunes partitions at the scan — the
    * time-travel read path); the winner per (cell, key) is a
    * map-side-combinable `max(struct(eff, seq, …))` argmax, never a
    * rank window over the log.
    */
  def bitemporalQuery(spark: SparkSession, dir: String): DataFrame = {
    val log = docChangelog(spark, dir)
      .withColumn("eff", col("seq") % 50)
    val grid = log.agg(max(col("seq")).as("mx"))
      .select(explode(array(lit(1L), lit(2L))).as("tver"), col("mx"))
      .select(col("tver"), expr("(mx * tver) div 2").as("tcut"),
        explode(array(lit(24L), lit(49L))).as("vcut"))
    log.crossJoin(broadcast(grid))
      .filter(col("seq") <= col("tcut") && col("eff") <= col("vcut"))
      .groupBy("tver", "tcut", "vcut", "key")
      .agg(max(struct(col("eff"), col("seq"), col("op"), col("val")))
        .as("w"))
      .filter(col("w.op") =!= "D")
      .select(col("tver"), col("tcut"), col("vcut"), col("key"),
        col("w.eff").as("eff"), col("w.seq").as("seq"),
        col("w.op").as("op"), col("w.val").as("val"))
      .orderBy("tver", "vcut", "key")
  }

  /** X138: THREE-WAY merge — the git-merge of table maintenance: two
    * divergent snapshots ("mine"/"theirs", e.g. two regions' edits)
    * reconciled against their common BASE. Per key, each side's change
    * is classified against base (kept / updated / deleted); the merge
    * takes the unchanged side's row when only one side touched the key,
    * accepts identical edits, and flags genuine divergence —
    * update-vs-update with different values, and delete-vs-update —
    * as conflicts with both sides surfaced (never silently resolved:
    * last-writer-wins is what X31's MERGE does; THIS operator's job is
    * to refuse). Snapshot edits are deterministic key-arithmetic
    * derivations so every branch of the matrix is exercised at any SF.
    *
    * Scale shape: one full-outer 3-relation key join (coalesced via two
    * full-outers), all compares row-local; the only shuffles key on the
    * merge key. The diff-classify-resolve matrix is exactly the CRDT /
    * Delta-Lake-replication reconcile loop at warehouse scale.
    */
  def threeWayMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"),
        col("c_acctbal").cast(D2).as("base_val"), col("c_mktsegment").as("base_seg"))
    // mine: +100.00 on keys %3==0, delete keys %7==0
    val mine = base.filter(col("key") % 7 =!= 0)
      .select(col("key"),
        when(col("key") % 3 === 0, col("base_val") + lit(100).cast(D2))
          .otherwise(col("base_val")).as("mine_val"))
    // theirs: +200.00 on keys %4==0, delete keys %5==0
    val theirs = base.filter(col("key") % 5 =!= 0)
      .select(col("key"),
        when(col("key") % 4 === 0, col("base_val") + lit(200).cast(D2))
          .otherwise(col("base_val")).as("theirs_val"))
    val joined = base
      .join(mine, Seq("key"), "full_outer")
      .join(theirs, Seq("key"), "full_outer")
    val mineChanged = col("mine_val").isNull ||
      col("mine_val") =!= col("base_val")
    val theirsChanged = col("theirs_val").isNull ||
      col("theirs_val") =!= col("base_val")
    joined.select(col("key"),
        when(!mineChanged && !theirsChanged, "unchanged")
          .when(mineChanged && !theirsChanged, "take_mine")
          .when(!mineChanged && theirsChanged, "take_theirs")
          .when(col("mine_val").isNull && col("theirs_val").isNull,
            "both_deleted")
          .when(col("mine_val") <=> col("theirs_val"), "both_same")
          .when(col("mine_val").isNull || col("theirs_val").isNull,
            "conflict_delete_update")
          .otherwise("conflict_update_update").as("resolution"),
        col("base_val").cast("double").as("base_val"),
        col("mine_val").cast("double").as("mine_val"),
        col("theirs_val").cast("double").as("theirs_val"),
        when(!mineChanged && !theirsChanged, col("base_val"))
          .when(mineChanged && !theirsChanged, col("mine_val"))
          .when(!mineChanged && theirsChanged, col("theirs_val"))
          .when(col("mine_val") <=> col("theirs_val"), col("mine_val"))
          .cast("double").as("merged_val"))
      .orderBy("key")
  }

  /** X80: point-in-time (PIT) join against an SCD2 dimension ledger —
    * every order picks up the customer-dimension VERSION that was valid
    * on its order date (the correctness cornerstone of slowly-changing-
    * dimension warehousing: joining today's attributes onto historical
    * facts corrupts history). The ledger is a deterministic 3-version
    * derivation per customer (boundaries spread by custkey so every
    * version is exercised at every SF).
    *
    * Spark-first shape: the same union+running-window as the event
    * AS-OF join (X58), partitioned by the DIMENSION KEY — version rows
    * and fact rows interleave in (key, time) order and `last(_,
    * ignoreNulls)` carries the in-force version onto each fact. One
    * shuffle on custkey; the oracle states the naive
    * `valid_from <= d` + rank-1 range join.
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_mktsegment"))
    val versions = c.select(col("key"),
        explode(array(
          struct(lit(1L).as("ver"), lit("1990-01-01").as("vf")),
          struct(lit(2L).as("ver"), lit("1996-06-01").as("vf")),
          struct(lit(3L).as("ver"), lit("1999-03-01").as("vf"))))
          .as("v"))
      .select(col("key"), col("v.ver").as("ver"),
        col("v.vf").cast("date").as("vf"))
    val facts = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey").as("key"),
        col("o_orderdate").cast("date").as("d"))
    // union-tag: versions sort before facts on the same date (kind 0<1)
    // so a version effective ON the order date applies to it
    val tagged = versions.select(col("key"), col("vf").as("d"),
        lit(0).as("kind"), col("ver"),
        lit(null).cast("long").as("o_orderkey"))
      .unionByName(facts.select(col("key"), col("d"), lit(1).as("kind"),
        lit(null).cast("long").as("ver"), col("o_orderkey")))
    val w = Window.partitionBy("key")
      .orderBy(col("d"), col("kind"),
        coalesce(col("ver"), lit(0L)), coalesce(col("o_orderkey"), lit(0L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("in_force", last(col("ver"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("o_orderkey"), col("key").as("c_custkey"),
        date_format(col("d"), "yyyy-MM-dd").as("order_date"),
        col("in_force").as("dim_version"))
      .orderBy("o_orderkey")
  }

  /** X53: snapshot diff — classify every key across two table versions
    * as added / removed / changed / unchanged (the "what did this load
    * do" audit between lakehouse versions, i.e. table time-travel diff).
    *
    * Change detection compares md5 CONTENT fingerprints, never the full
    * payload: at 100 TB both sides project (key, fingerprint) at the
    * scan — two narrow columns through one co-partitioned full-outer
    * join on the key, identical shape to [[mergeUpsert]]. The reference
    * does the same classification one `filter`/`find` pair at a time
    * (DataWarehouse.js:140-180); here it is a single relational pass.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), col("fp").as("fp1"),
      lit(true).as("_v1"))
    val b = v2.select(col("doc_id"), col("fp").as("fp2"),
      lit(true).as("_v2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_v1").isNull, "added")
          .when(col("_v2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The oracled fixture instantiation of [[snapshotDiff]]: v1 is the
    * documents table, v2 a deterministic next version — every 31st doc
    * (mod 7) dropped, every 13th (mod 3) edited, a disjoint +1e6-keyed
    * batch appended — so all four statuses are populated at every SF.
    */
  def snapshotDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val v2base = Tables.documents(spark, dir)
      .filter(col("doc_id") % 31 =!= 7)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 13 === 3, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("fp"))
    val v2new = Tables.documents(spark, dir)
      .filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        md5(concat(lit("new "), col("text"))).as("fp"))
    snapshotDiff(v1, v2base.unionByName(v2new)).orderBy("doc_id")
  }

  /** X97: cascade delete audit — the right-to-erasure (GDPR art. 17)
    * propagation every warehouse needs: a deletion key set on the root
    * entity (customers with custkey ≡ 0 mod 97 stand in for the request
    * queue) cascades through the foreign-key chain customer → orders →
    * lineitem; the output is the per-table audit (rows deleted /
    * surviving) that the erasure job logs.
    *
    * Scale shape: deletes are anti-join predicates, never row-by-row —
    * the root key set broadcasts; the orders-level delete set is itself
    * the join key for the lineitem cascade (one hash semi-join per FK
    * hop). On a real lakehouse the same relations drive deletion-vector
    * writes; the audit aggregate is what this entry pins.
    */
  def cascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    val delC = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0).select("c_custkey")
    val orders = Tables.orders(spark, dir)
    val delO = orders.join(broadcast(delC),
      orders("o_custkey") === delC("c_custkey"), "left_semi")
      .select("o_orderkey")
    val li = Tables.lineitem(spark, dir)
    def audit(table: String, total: DataFrame, deleted: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(broadcast(deleted.agg(count(lit(1)).as("n_deleted"))))
        .select(lit(table).as("table_name"), col("n_deleted"),
          (col("n_total") - col("n_deleted")).as("n_surviving"))
    audit("customer", Tables.customer(spark, dir), delC)
      .unionByName(audit("orders", orders, delO))
      .unionByName(audit("lineitem", li,
        li.join(delO, li("l_orderkey") === delO("o_orderkey"), "left_semi")))
      .orderBy("table_name")
  }

  /** X113: golden-record survivorship — after dedup finds that N source
    * rows are the same entity, something has to decide which attribute
    * values the ONE canonical row keeps (the MDM "merge" step; dedup
    * without it just produces clusters). Clusters here key on the
    * 5-word-prefix blocking fingerprint (the fixtures contain no
    * verbatim-identical texts, so the X1 exact key would yield only
    * singletons; in production the cluster id is whatever the dedup
    * family emitted — X50's component id plugs in unchanged) with ≥ 2
    * members;
    * survivorship rules are the standard trio, each stated as an
    * order-free aggregate so the result is identical in any partition
    * order:
    *   - `doc_id`     → MIN (oldest id wins — recency/priority proxy)
    *   - `lang`/`source` → MODE, ties to the lexicographically smallest
    *     value, computed as `min(struct(-cnt, value))` over per-cluster
    *     value counts — an argmax with a total tie order, not a window
    *   - `n_chars`    → MAX (the most complete variant survives)
    *
    * Scale shape: one groupBy(cluster) pass for the scalar rules, one
    * two-level groupBy(cluster, value) → argmax pass per modal column;
    * everything is map-side combinable and shuffles only cluster keys.
    * No window functions, so no per-cluster sort at any scale.
    */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(expr("concat_ws(' ', slice(split(text, ' '), 1, 5))"))
          .as("cluster"),
        col("lang"), col("source"), col("n_chars"))
    val dupClusters = docs.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        min("doc_id").as("golden_doc_id"),
        max("n_chars").as("n_chars"))
      .filter(col("n_members") >= 2)
    def modal(valueCol: String): DataFrame =
      docs.join(dupClusters.select("cluster"), Seq("cluster"), "left_semi")
        .groupBy(col("cluster"), col(valueCol).as("v"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("cluster")
        .agg(min(struct((col("cnt") * -1).as("negc"), col("v")))
          .as("m"))
        .select(col("cluster"), col("m.v").as(valueCol))
    dupClusters
      .join(modal("lang"), Seq("cluster"))
      .join(modal("source"), Seq("cluster"))
      .select(col("cluster"), col("n_members"), col("golden_doc_id"),
        col("lang"), col("source"), col("n_chars"))
      .orderBy("cluster")
  }

  /** X210: retention-policy (TTL) audit — the table a lakehouse
    * compaction/GC job consults before a DELETE sweep: per event type,
    * a declared retention window (error telemetry 7 days, behavioural
    * events 14, money/identity events 365 — the typical compliance
    * tiering), the row count past its TTL relative to the corpus
    * watermark (NOT wall clock — the X177 rule, so the audit is
    * deterministic and replayable), the reclaim share, and the oldest
    * surviving timestamp after the sweep.
    *
    * All decisions are exact integer microsecond arithmetic; shares
    * are final 6dp divisions. Scale shape: one map-combinable
    * conditional aggregate per type against the broadcast 1-row
    * watermark — a metadata-sized audit over one corpus pass, exactly
    * what the real DELETE planner prunes partitions with.
    */
  def ttlAudit(spark: SparkSession, dir: String): DataFrame = {
    val us = unix_micros(col("ts"))
    val dayUs = 86400000000L
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), us.as("us"))
    val wm = ev.agg(max("us").as("wm"))
    val retDays = when(col("event_type") === "error", 7L)
      .when(col("event_type").isin("view", "click"), 14L)
      .otherwise(365L)
    ev.crossJoin(broadcast(wm))
      .withColumn("ret_days", retDays)
      .withColumn("expired", col("us") < col("wm") - col("ret_days") * dayUs)
      .groupBy("event_type")
      .agg(max("ret_days").as("retention_days"),
        count(lit(1)).as("n_rows"),
        sum(when(col("expired"), 1L).otherwise(0L)).as("n_expired"),
        min(when(!col("expired"), col("us"))).as("oldest_kept_us"))
      .select(col("event_type"), col("retention_days"), col("n_rows"),
        col("n_expired"),
        round(col("n_expired").cast("double") / col("n_rows"), 6)
          .as("reclaim_share"),
        col("oldest_kept_us"))
      .orderBy("event_type")
  }

  /** The full-sync source snapshot for [[mergeFullSync]]: the DESIRED
    * state — every key not divisible by 3 survives (÷3 keys get
    * retired), keys ≡ 0 (mod 4) carry a changed payload (the MATCHED
    * AND <changed> condition is genuinely selective), and +2e6-offset
    * keys are net-new. Derived from the base so every clause fires at
    * every fixture SF.
    */
  def desiredCustomers(spark: SparkSession, dir: String): DataFrame = {
    val base = baseCustomers(spark, dir)
    base.filter(col("key") % 3 =!= 0)
      .select(col("key"),
        when(col("key") % 4 === 0, concat(col("name"), lit(" (v2)")))
          .otherwise(col("name")).as("s_name"),
        when(col("key") % 4 === 0, col("bal") + lit(50).cast(D2))
          .otherwise(col("bal")).as("s_bal"))
      .unionByName(base.filter(col("key") % 13 === 2)
        .select((col("key") + 2000000L).as("key"),
          concat(lit("Synced "), col("name")).as("s_name"),
          lit(0).cast(D2).as("s_bal")))
  }

  /** X194: full-sync MERGE — the WHEN NOT MATCHED BY SOURCE form
    * (SQL:2023; Spark 3.4+ MERGE INTO) that [[mergeUpsert]]'s
    * changelog shape cannot express because a changelog never says
    * "this key is GONE": the source is a complete desired snapshot,
    * so target rows absent from it are retired (NOT MATCHED BY SOURCE
    * THEN DELETE), matched rows update ONLY when the payload actually
    * differs (MATCHED AND <changed> THEN UPDATE — exact DECIMAL
    * comparison, no float equality), and source-only rows insert. The
    * output is the merge AUDIT relation: every row with its action
    * (updated / unchanged / inserted / deleted) and final payload
    * (retired rows keep their last values under the 'deleted' flag) —
    * what a warehouse writes to the merge log while applying the
    * partition swap.
    *
    * Scale shape: ONE full-outer equi-join on the key (the mergeUpsert
    * plan) — at 100 TB both sides bucket on the key and the join is
    * zero-exchange; the change detection is a row-local comparison,
    * never a second pass.
    */
  def mergeFullSync(spark: SparkSession, dir: String): DataFrame = {
    val t = baseCustomers(spark, dir).withColumn("_t", lit(true))
    val s = desiredCustomers(spark, dir).withColumn("_s", lit(true))
    val matched = col("_t").isNotNull && col("_s").isNotNull
    val changed = col("s_name") =!= col("name") || col("s_bal") =!= col("bal")
    t.join(s, Seq("key"), "full_outer")
      .withColumn("action",
        when(matched && changed, "updated")
          .when(matched, "unchanged")
          .when(col("_t").isNull, "inserted")
          .otherwise("deleted"))
      .select(col("key"),
        when(col("action").isin("updated", "inserted"), col("s_name"))
          .otherwise(col("name")).as("name"),
        when(col("action").isin("updated", "inserted"), col("s_bal"))
          .otherwise(col("bal")).cast("double").as("bal"),
        col("action"))
      .orderBy("key")
  }

  /** X228: Data Vault load audit — the hub/link/satellite derivation
    * (Linstedt's raw vault) for the customer↔order subject area, as the
    * per-artifact audit row a vault load job publishes: hubs carry
    * md5 business-key hashes, the link carries the md5 of its parents'
    * hub keys, and the customer satellite carries an md5 HASHDIFF over
    * its descriptive attributes (the change-detection key an
    * incremental satellite load compares). Row counts, distinct hash
    * counts (hash-collision audit: must equal the key counts) and a
    * min/max hash fingerprint make the load itself hash-comparable.
    *
    * Scale shape: every artifact is one distinct/aggregate over a
    * narrow projection — hash computation is per-row narrow work, the
    * vault pattern's whole point (loads parallelize per artifact with
    * no cross-artifact dependency); output is 4 audit rows.
    */
  def dataVaultAudit(spark: SparkSession, dir: String): DataFrame = {
    def audit(name: String, keyed: DataFrame): DataFrame =
      keyed.agg(count(lit(1)).as("n_rows"),
        countDistinct(col("hk")).as("n_distinct_hashes"),
        min("hk").as("min_hash"), max("hk").as("max_hash"))
        .select(lit(name).as("artifact"), col("n_rows"),
          col("n_distinct_hashes"), col("min_hash"), col("max_hash"))
    val hubCust = Tables.customer(spark, dir)
      .select(col("c_custkey")).distinct()
      .select(md5(concat(lit("cust|"), col("c_custkey").cast("string")))
        .as("hk"))
    val hubOrder = Tables.orders(spark, dir)
      .select(col("o_orderkey")).distinct()
      .select(md5(concat(lit("order|"), col("o_orderkey").cast("string")))
        .as("hk"))
    val link = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey")).distinct()
      .select(md5(concat(
        md5(concat(lit("order|"), col("o_orderkey").cast("string"))),
        lit("|"),
        md5(concat(lit("cust|"), col("o_custkey").cast("string")))))
        .as("hk"))
    val satCust = Tables.customer(spark, dir)
      .select(md5(concat_ws("|", col("c_mktsegment"),
        col("c_nationkey").cast("string"))).as("hk"))
    audit("hub_customer", hubCust)
      .unionByName(audit("hub_order", hubOrder))
      .unionByName(audit("link_order_customer", link))
      .unionByName(audit("sat_customer_hashdiff", satCust))
      .orderBy("artifact")
  }

  /** X262: snapshot-retention (GFS) planner — the expiry table a
    * lakehouse GC consults before dropping table snapshots:
    * grandfather–father–son tiers over the observed snapshot days
    * (here: the distinct event days, snapshots-per-day being the usual
    * cadence), relative to the corpus WATERMARK (the X177 rule — never
    * wall clock, so the plan is deterministic and replayable):
    *  - 'daily'   — everything younger than 7 days;
    *  - 'weekly'  — the newest snapshot of each trailing 7-day bucket
    *                (age div 7 ∈ 1..4 — integer buckets, not ISO weeks,
    *                which differ across engines);
    *  - 'monthly' — the newest snapshot of each (year, month) younger
    *                than 365 days;
    *  - 'drop'    — everything else (the reclaim set).
    * Priority daily > weekly > monthly; all decisions integer date
    * arithmetic.
    *
    * Scale shape: snapshots collapse to one row per day first
    * (calendar-bounded); the per-bucket/per-month newest picks are
    * min/max aggregates over that day-sized relation. No windows.
    */
  def retentionPlan(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day")).distinct()
    val wm = days.agg(max("day").as("wm"))
    val aged = days.crossJoin(broadcast(wm))
      .withColumn("age_days", datediff(col("wm"), col("day")).cast("long"))
    val weeklyKeep = aged
      .filter(expr("age_days div 7") >= 1 && expr("age_days div 7") <= 4)
      .groupBy(expr("age_days div 7").as("wk"))
      .agg(min("age_days").as("age_days"))
      .select(col("age_days"), lit(true).as("is_weekly"))
    val monthlyKeep = aged.filter(col("age_days") < 365)
      .groupBy(year(col("day")).as("y"), month(col("day")).as("m"))
      .agg(min("age_days").as("age_days"))
      .select(col("age_days"), lit(true).as("is_monthly"))
    aged
      .join(weeklyKeep, Seq("age_days"), "left")
      .join(monthlyKeep, Seq("age_days"), "left")
      .select(col("day"), col("age_days"),
        when(col("age_days") < 7, "daily")
          .when(coalesce(col("is_weekly"), lit(false)), "weekly")
          .when(coalesce(col("is_monthly"), lit(false)), "monthly")
          .otherwise("drop").as("keep_reason"))
      .orderBy("day")
  }
}
