package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MERGE/CDC semantics on inline relations: every branch observable,
  * plus the invariants that make them safe to re-run (idempotence of an
  * empty merge, resurrection behavior of the changelog).
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", BigDecimal("10.00")),
    (2L, "b", BigDecimal("20.00")),
    (3L, "c", BigDecimal("30.00"))).toDF("key", "name", "bal")

  test("mergeUpsert: update, delete, insert and keep branches") {
    val changes = Seq(
      (1L, "a (updated)", BigDecimal("110.00"), "U"),
      (3L, "c", BigDecimal("0.00"), "D"),
      (9L, "New z", BigDecimal("0.00"), "I"))
      .toDF("key", "u_name", "u_bal", "op")
    val out = Warehouse.mergeUpsert(base, changes).orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq == Seq(
      (1L, "a (updated)", 110.0, "updated"),
      (2L, "b", 20.0, "kept"),
      (9L, "New z", 0.0, "inserted")))
  }

  test("mergeUpsert: empty change set is the identity (idempotent re-run)") {
    val empty = Seq.empty[(Long, String, BigDecimal, String)]
      .toDF("key", "u_name", "u_bal", "op")
    val out = Warehouse.mergeUpsert(base, empty).orderBy("key").collect()
    assert(out.length == 3 && out.forall(_.getString(3) == "kept"))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("mergeUpsert: ANSI no-op branches — matched 'I' keeps base, unmatched 'U'/'D' vanish") {
    val changes = Seq(
      // matched row with op='I': NOT an overwrite — base row survives as-is
      (1L, "SHOULD NOT APPEAR", BigDecimal("999.00"), "I"),
      // update/delete of keys absent from base: no target row, no output
      (8L, "ghost", BigDecimal("1.00"), "U"),
      (9L, "ghost", BigDecimal("1.00"), "D"))
      .toDF("key", "u_name", "u_bal", "op")
    val out = Warehouse.mergeUpsert(base, changes).orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq == Seq(
      (1L, "a", 10.0, "kept"),
      (2L, "b", 20.0, "kept"),
      (3L, "c", 30.0, "kept")))
  }

  test("cdcApply: last op wins, deletes drop, delete-then-insert resurrects") {
    val log = Seq(
      // key 1: I then U -> present with the U payload
      (1L, 1L, "I", 10L, "en"), (5L, 1L, "U", 11L, "en"),
      // key 2: I then D -> absent
      (2L, 2L, "I", 20L, "en"), (6L, 2L, "D", 0L, "en"),
      // key 3: D then later I -> resurrected
      (3L, 3L, "D", 0L, "es"), (7L, 3L, "I", 33L, "es"))
      .toDF("seq", "key", "op", "val", "lang")
    val out = Warehouse.cdcApply(log).orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getLong(4))).toSeq ==
      Seq((1L, 11L, "U", 2L), (3L, 33L, "I", 2L)))
  }

  test("fixture instantiation populates every merge branch") {
    val actions = Warehouse.mergeUpsertQuery(spark, sf001)
      .groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet == Set("kept", "updated", "inserted"))
    assert(actions.values.forall(_ > 0))
    // deletes actually removed rows: merged size = base - deletes + inserts
    val n = Warehouse.mergeUpsertQuery(spark, sf001).count()
    val baseN = spark.read.parquet(s"$sf001/customer.parquet").count()
    val chg = Warehouse.customerChanges(spark, sf001)
    val dels = chg.filter(col("op") === "D").count()
    val ins = chg.filter(col("op") === "I").count()
    assert(n == baseN - dels + ins)
  }

  test("snapshotDiff: statuses match the modular construction exactly") {
    val ids = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected =
      ids.map { id =>
        id -> (if (id % 31 == 7) "removed"
               else if (id % 13 == 3) "changed"
               else "unchanged")
      } ++ ids.filter(_ % 50 == 0).map(id => (id + 1000000L) -> "added")
    val got = Warehouse.snapshotDiffQuery(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(got == expected)
    // all four statuses populated at the smallest SF
    assert(got.map(_._2) == Set("added", "removed", "changed", "unchanged"))
  }
}
