package graft

import graft.oracle.OracleSql

/** Structural guard against silent key shadowing in the `++`-merged entry
  * maps. `Map ++ Map` keeps the LATER value on a key collision, so a
  * duplicate key across two query families drops an implemented operator
  * from the verified surface without any test failing — exactly what
  * happened when an as-of twin reused `events_asof_join` and hid the
  * click→purchase variant for a round. These checks turn that failure
  * class into a named assertion.
  */
class DuplicateKeyGuardSpec extends SparkSpec {

  test("SparkEntry.queries loses no entry to a key collision") {
    val fams = SparkEntry.queryFamilies
    val merged = SparkEntry.queries
    val total = fams.map(_._2.size).sum
    assert(merged.size == total,
      s"queries.size=${merged.size} != sum of family sizes=$total — " +
        "a key collision is shadowing an entry")
  }

  test("SparkEntry query families are pairwise disjoint") {
    val fams = SparkEntry.queryFamilies
    for {
      Seq((na, a), (nb, b)) <- fams.combinations(2)
      shared = a.keySet.intersect(b.keySet)
    } assert(shared.isEmpty,
      s"families '$na' and '$nb' share keys: ${shared.toSeq.sorted.mkString(", ")}")
  }

  test("OracleSql.all loses no entry to a key collision") {
    val fams = OracleSql.oracleFamilies
    val merged = OracleSql.all
    val total = fams.map(_._2.size).sum + OracleSql.aliasKeys.size
    assert(merged.size == total,
      s"OracleSql.all.size=${merged.size} != family sizes + aliases=$total — " +
        "a key collision is shadowing an oracle")
  }

  test("OracleSql families are pairwise disjoint and aliases are fresh keys") {
    val fams = OracleSql.oracleFamilies
    for {
      Seq((na, a), (nb, b)) <- fams.combinations(2)
      shared = a.keySet.intersect(b.keySet)
    } assert(shared.isEmpty,
      s"oracle families '$na' and '$nb' share keys: ${shared.toSeq.sorted.mkString(", ")}")
    val familyKeys = fams.iterator.flatMap(_._2.keySet).toSet
    val clash = OracleSql.aliasKeys.intersect(familyKeys)
    assert(clash.isEmpty, s"alias keys collide with family keys: $clash")
  }

  test("every oracled key names a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = OracleSql.all.keySet.diff(qs)
    assert(orphans.isEmpty,
      s"oracle SQL with no matching query entry: ${orphans.toSeq.sorted.mkString(", ")}")
  }
}
