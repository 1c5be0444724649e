package graft.ext

import graft.SparkSpec

/** Executable guard for Bench's staged pair-cache release (r12 advice):
  * the `lateConsumerKeys` whitelist and the derived release point are
  * hand-declared against Bench's name-sorted sweep order, and a drift in
  * either direction used to be silent — a stale late key protects
  * nothing, and a future entry sorted after the release point that reads
  * a released memo would double-build it, re-introducing the exact
  * attribution distortion the staged release fixed. Both invariants are
  * probed here against the real memo cache.
  */
class ReleaseInvariantSpec extends SparkSpec {

  test("staged pair-cache release: late keys are real and no " +
    "post-release entry resurrects a released memo") {
    // 1. fully warm the shared relations — the Bench warm path
    TextDedup.warmSharedRelations(spark, sf001)
    val warmed = TextDedup.memoKeys(spark)
    val stale = TextDedup.lateConsumerKeys -- warmed
    assert(stale.isEmpty,
      s"lateConsumerKeys name memos a full warm never builds: $stale")

    // 2. the release must drop everything EXCEPT the late keys
    TextDedup.releasePairCaches(spark)
    val after = TextDedup.memoKeys(spark)
    assert(after.subsetOf(TextDedup.lateConsumerKeys),
      s"release left non-late keys live: " +
        s"${after -- TextDedup.lateConsumerKeys}")

    // 3. relCache-miss probe: memo population happens at DataFrame
    //    CONSTRUCTION, so constructing every entry name-sorted after the
    //    release point must not re-create any released key. The point is
    //    computed with Bench's OWN derivation (r13 advice: a literal
    //    here went stale the moment a later-sorting consumer appeared,
    //    silently shrinking this guard's coverage). stream_* entries
    //    execute their query on construction and call only the pure
    //    (non-memoized) TextDedup helpers — excluded for cost, like
    //    the fs-dependent scan_inventory (both mirror PlanHygieneSpec's
    //    sweep filter).
    val releasePoint =
      graft.Bench.pairReleasePoint(graft.SparkEntry.queries.keys).get
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        n > releasePoint && n != "scan_inventory" &&
          !n.startsWith("stream_")
      }
      .foreach { case (name, fn) =>
        fn(spark, sf001)
        val leaked = TextDedup.memoKeys(spark) --
          TextDedup.lateConsumerKeys
        assert(leaked.isEmpty,
          s"entry $name rebuilt released memo(s) $leaked — add the key " +
            "to lateConsumerKeys or the entry to Bench's " +
            "pairCacheConsumers so the release point moves past it")
      }
  }
}
