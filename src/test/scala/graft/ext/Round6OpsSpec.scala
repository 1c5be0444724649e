package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws and edge cases for the round-6 operator batch that the DuckDB
  * oracles don't pin: as-of tie semantics, skyline vs brute force on
  * adversarial ties, triangle counts vs brute force, fuzzy-join blocking
  * losslessness at distance boundaries, BFS hop minimality, KMV
  * mergeability, transition-probability stochasticity, MAD median law,
  * time-travel/full-log consistency.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: equal-timestamp click is visible; ties break to max id") {
    val got = Events.asofJoin(spark, sf001).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    // brute-force replay over the raw fixture
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    assert(got.size == purchases.length)
    purchases.foreach { case (pid, uid, _, pus) =>
      val cands = clicks.filter(c => c._2 == uid && c._4 <= pus)
      val want =
        if (cands.isEmpty) -1L
        else cands.maxBy(c => (c._4, c._1))._1 // latest ts, then max id
      assert(got(pid) == want, s"purchase $pid")
    }
  }

  test("skyline equals the brute-force dominance filter incl. tie rows") {
    val pts = Seq( // (key, price, size): price ties, size ties, duplicates
      (1L, 10.0, 5), (2L, 10.0, 7), (3L, 10.0, 7), (4L, 12.0, 7),
      (5L, 12.0, 9), (6L, 15.0, 9), (7L, 9.0, 1), (8L, 20.0, 10),
      (9L, 20.0, 10), (10L, 25.0, 3))
    val df = pts.toDF("p_partkey", "p_retailprice", "p_size")
    val tmp = java.nio.file.Files.createTempDirectory("sky").toString
    df.write.mode("overwrite").parquet(s"$tmp/part.parquet")
    val got = Analytics.skyline(spark, tmp, bucketWidth = 4.0)
      .collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, qp, qs) =>
        qp <= p && qs >= s && (qp < p || qs > s) }
    }.map(_._1).toSet
    assert(got == want && want == Set(2L, 3L, 5L, 7L, 8L, 9L))
  }

  test("triangles equal the brute-force count on the same edge set") {
    val und = Graphs.triangles(spark, sf001) // degree-oriented impl
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over the co-order edges computed independently
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCnt = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj.getOrElse(b, Set.empty) if edges((a, c))) {
      triCnt(a) += 1; triCnt(b) += 1; triCnt(c) += 1
    }
    assert(und == triCnt.toMap, "per-node triangle counts diverge")
    assert(und.values.sum % 3 == 0 && und.nonEmpty)
  }

  test("fuzzy join: deletion blocking finds exactly the distance<=1 pairs") {
    // names chosen to hit: substitution, insertion, deletion, equality
    // excluded (a<b), transposition (distance 2 — must NOT match)
    val names = Seq("abcd", "abed", "abd", "abcde", "bacd", "zzzz")
    val df = names.toDF("c_name")
      .withColumn("c_custkey", monotonically_increasing_id())
      .withColumn("c_nationkey", lit(0))
      .withColumn("c_acctbal", lit(0.0))
      .withColumn("c_mktsegment", lit("X"))
    val tmp = java.nio.file.Files.createTempDirectory("fuzz").toString
    df.write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = Linkage.fuzzyNameJoin(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for (a <- names; b <- names if a < b && lev(a, b) <= 1)
      yield (a, b)).toSet
    assert(got == want)
    assert(!got.contains(("abcd", "bacd"))) // transposition = distance 2
  }

  test("bfs hops are minimal: every hop-h node has a hop-(h-1) neighbor") {
    val hops = Graphs.bfsHops(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    li.groupBy(_._1).values.foreach { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a != b) adj(a) += b
    }
    assert(hops.values.forall(h => h >= 0 && h <= 3))
    hops.filter(_._2 > 0).foreach { case (id, h) =>
      assert(adj(id).exists(n => hops.get(n).contains(h - 1)),
        s"node $id at hop $h lacks a hop-${h - 1} neighbor")
      assert(!adj(id).exists(n => hops.getOrElse(n, 99L) < h - 1),
        s"node $id at hop $h has a closer neighbor — not minimal")
    }
  }

  test("kmv rollup: merged day sketches equal the direct monthly sketch") {
    val rows = Analytics.kmvRollup(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"estimate ${r.getString(0)}")
      assert(r.getString(3) == r.getString(4), s"kth min ${r.getString(0)}")
    }
  }

  test("transition matrix rows are stochastic per from_type") {
    val rows = Events.transitionMatrix(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val byFrom = rows.groupBy(_._1)
    assert(byFrom.nonEmpty)
    byFrom.values.foreach { g =>
      assert(math.abs(g.map(_._3).sum - 1.0) < 1e-9)
      g.foreach { case (_, n, p) => assert(p > 0.0 && n > 0L) }
    }
  }

  test("outlier mad: median minimizes beyond-1-mad mass vs the law n/2") {
    val rows = Analytics.outlierMad(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, beyond1) = (r.getLong(1), r.getLong(4))
      // dev > MAD holds for at most half the rows (MAD is the median
      // of deviations) and the curve is monotone
      assert(beyond1 * 2 <= n + 1)
      assert(r.getLong(4) >= r.getLong(5) && r.getLong(5) >= r.getLong(6))
    }
  }

  test("time travel at the full-log cut equals cdcApply") {
    val log = Warehouse.docChangelog(spark, sf001)
    val maxSeq = log.agg(max("seq")).collect()(0).getLong(0)
    val full = Warehouse.cdcTimeTravel(log, maxSeq)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = Warehouse.cdcApply(log)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(full == direct && full.nonEmpty)
  }

  test("equidepth boundaries split into buckets of depth within one quantum") {
    val bounds = Analytics.equidepthHist(spark, sf001, nBuckets = 8).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(bounds.length == 7)
    val vs = graft.tables.Tables.orders(spark, sf001)
      .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
    val n = vs.length
    bounds.foreach { case (b, target, boundary) =>
      assert(target == (b.toLong * n + 7) / 8)
      // the boundary IS the value at the target rank (1-indexed)
      assert(boundary == vs(target.toInt - 1), s"bucket $b")
    }
    assert(bounds.map(_._3).sorted.sameElements(bounds.map(_._3)))
  }

  test("interval join equals the naive all-pairs overlap join") {
    val got = Events.intervalJoin(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSet
    // naive recomputation from the same session/promo derivations
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gap = 1800000000L
    val sessions = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val sess = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var sid = 0L
      ts.foreach { t =>
        if (sess.nonEmpty && t - sess.last._3 <= gap)
          sess(sess.length - 1) = (sess.last._1, sess.last._2, t)
        else { sid += 1; sess += ((sid, t, t)) }
      }
      sess.map { case (s, a, b) => (u, s, a, b) }
    }.toSeq
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val promos = (0L to (mx - mn) / 129600000000L).map { p =>
      (p, mn + p * 129600000000L, mn + p * 129600000000L + 21600000000L) }
    val want = (for {
      (u, sid, s, e) <- sessions
      (p, ps, pe) <- promos if s <= pe && ps <= e
    } yield (u, sid, p, math.min(e, pe) - math.max(s, ps))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("merkle diff flags exactly the ranges containing corruption") {
    val segs = graft.ext.DataQuality.merkleRanges(spark, sf001).collect()
      .map(_.getLong(0)).toSet
    val ids = graft.tables.Tables.documents(spark, sf001)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val want = ids.filter(id => id % 101 == 13 || id % 37 == 5)
      .map(_ / 64).toSet
    assert(segs == want && segs.nonEmpty)
  }

  test("incremental join view equals the full recompute") {
    val merged = Materialize.incrJoinMerge(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    val c = graft.tables.Tables.customer(spark, sf001)
      .select(col("c_custkey"), col("c_nationkey"))
    val o = graft.tables.Tables.orders(spark, sf001)
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    val full = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("p").cast("double").as("rev"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(merged == full && merged.nonEmpty)
  }

  test("regression recovers an exact linear law") {
    // y = 3x + 7 exactly: slope/intercept must come back exact, r2 = 1
    val df = (1 to 100).map(i => ("A", i.toDouble, 3.0 * i + 7.0))
      .toDF("l_returnflag", "l_quantity", "l_extendedprice")
    val tmp = java.nio.file.Files.createTempDirectory("reg").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val r = Analytics.regressionExact(spark, tmp).collect()(0)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0 &&
      r.getDouble(4) == 1.0)
  }
}
