package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the third round-7 operator batch, each checked against a
  * driver-side brute force on the tiny fixture — independent
  * re-derivations, not replays of the Spark plan: k-core against naive
  * set peeling, the FK audit against collected-table counting, the
  * sweep-line concurrency against a literal per-day interval scan, and
  * the log2 quantile sketch against the bucket bracket law + an exact
  * sorted-rank percentile.
  */
class Round7cOpsSpec extends SparkSpec {

  private def coOrderEdges(dir: String): Seq[(Long, Long)] = {
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
  }

  test("kcore: equals naive peeling; rounds within the oracle unroll") {
    val k = 64
    val got = Graphs.kcore(spark, sf001, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = coOrderEdges(sf001)
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    var alive: Set[Long] = adj.keySet.toSet
    var rounds = 0
    var changed = true
    while (changed) {
      val dead = alive.filter(u => adj(u).count(alive) < k)
      changed = dead.nonEmpty
      if (changed) { alive = alive -- dead; rounds += 1 }
    }
    val expected = alive.map(u => u -> adj(u).count(alive).toLong).toMap
    assert(got == expected, "kcore must equal naive fixpoint peeling")
    assert(expected.nonEmpty, "k=64 core must be non-empty at sf0.001")
    assert(rounds > 0, "k=64 must actually peel at sf0.001")
    assert(Graphs.kcoreRounds(spark, sf001).exists(_ <= Graphs.kcoreOracleRounds),
      "fixture peel rounds must stay within the oracle unroll depth")
  }

  test("fk audit: counts equal collected-table brute force on two edges") {
    val rows = DataQuality.fkOrphanAudit(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(rows.size == 7)
    val custKeys = graft.tables.Tables.customer(spark, sf001)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val ordCust = graft.tables.Tables.orders(spark, sf001)
      .select("o_custkey").collect().map(_.getLong(0))
    val (nChild, nNull, nOrphan, nOrphanKeys, nParent, nChildless) =
      rows("orders.o_custkey->customer")
    assert(nChild == ordCust.length)
    assert(nNull == 0 && nOrphan == ordCust.count(!custKeys(_)))
    assert(nOrphanKeys == ordCust.filter(!custKeys(_)).distinct.length)
    assert(nParent == custKeys.size)
    assert(nChildless == custKeys.count(k => !ordCust.contains(k)))
    // second edge brute-forced from the other side of the star
    val partKeys = graft.tables.Tables.part(spark, sf001)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val liPart = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_partkey").collect().map(_.getLong(0))
    val li = rows("lineitem.l_partkey->part")
    assert(li._1 == liPart.length && li._3 == liPart.count(!partKeys(_)))
    assert(li._6 == partKeys.count(k => !liPart.contains(k)))
  }

  test("order concurrency: month peaks equal a literal per-day interval scan") {
    val got = Analytics.orderConcurrency(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val iv = graft.tables.Tables.orders(spark, sf001)
      .select(col("o_orderkey").as("ok"), to_date(col("o_orderdate")).as("open"))
      .join(graft.tables.Tables.lineitem(spark, sf001)
        .groupBy(col("l_orderkey").as("ok"))
        .agg(max(to_date(col("l_shipdate"))).as("close")), Seq("ok"))
      .collect().map { r =>
        val o = r.getDate(1).toLocalDate
        val c = r.getDate(2).toLocalDate
        (o, if (c.isBefore(o)) o else c) // fixture has ship < order rows
      }
    val d0 = iv.map(_._1).min
    val d1 = iv.map(_._2).max.plusDays(1)
    val days = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1)).toSeq
    val conc = days.map(d => d ->
      iv.count { case (o, c) => !d.isBefore(o) && !d.isAfter(c) }.toLong)
    val expected = conc.groupBy { case (d, _) => f"${d.getYear}%04d-${d.getMonthValue}%02d" }
      .map { case (m, ds) =>
        (m, ds.map(_._2).max, ds.maxBy(_._1.toEpochDay)._2) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == expected,
      "sweep-line concurrency must equal the literal interval scan")
  }

  test("log2 quantiles: bracket law, exact rank targets, merge law") {
    val rows = Sketches.log2Quantiles(spark, sf001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getLong(5)))
    val centsByScope = graft.tables.Tables.orders(spark, sf001)
      .select(col("o_orderpriority").as("s"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted.toVector }
    val allCents = centsByScope.values.flatten.toVector.sorted
    for ((scope, qpct, n, target, bucket, lo) <- rows) {
      val vals: Vector[Long] =
        if (scope.startsWith("all_")) allCents else centsByScope(scope)
      assert(n == vals.length)
      assert(target == (qpct.toLong * n + 99) / 100, s"$scope q$qpct target")
      val exactDisc = vals(target.toInt - 1) // rank ceil(q*n), 1-based
      assert(lo == (1L << (bucket - 1)))
      assert(lo <= exactDisc && exactDisc < 2 * lo,
        s"$scope q$qpct: lower bound must bracket the exact quantile within 2x")
    }
    // merge law: the two global scopes are value-identical rows
    val direct = rows.filter(_._1 == "all_direct").map(t => t.copy(_1 = ""))
    val merged = rows.filter(_._1 == "all_merged").map(t => t.copy(_1 = ""))
    assert(direct.nonEmpty && direct.toSeq == merged.toSeq,
      "per-scope sketches merged must equal the direct global sketch")
  }

  test("incremental cluster merge: row-identical to from-scratch star CC") {
    val incr = TextDedup.incrementalClusterMerge(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    val full = TextDedup.nearDupClustersStar(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    assert(incr.nonEmpty && incr.toSeq == full.toSeq,
      "contract-and-merge must equal re-clustering the whole corpus")
  }

  test("kmv intersect: exact-degenerate mode and brute-force parity") {
    val rows = Analytics.kmvIntersect(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val du = graft.tables.Tables.events(spark, sf001)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = du.groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).toSet }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val k = 64
    val samples = byType.map { case (t, us) =>
      t -> us.map(u => md5hex(u.toString)).toVector.sorted.take(k)
    }
    for (((t1, t2), (exact, common, theta, est)) <- rows) {
      assert(exact == (byType(t1) & byType(t2)).size)
      val union = (samples(t1) ++ samples(t2)).distinct.sorted
      if (union.length >= k) {
        val thetaHex = union(k - 1)
        assert(theta == java.lang.Long.parseLong(thetaHex.take(8), 16))
        assert(common == (samples(t1).toSet & samples(t2).toSet)
          .count(_ < thetaHex))
        assert(est == BigDecimal(common * 4294967296.0 / theta)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } else {
        // sketch saw everything: estimate IS the exact intersection
        assert(theta == 4294967296L && common == exact && est == exact.toDouble)
      }
    }
    assert(rows.nonEmpty)
  }

  test("rake keywords: matches a literal driver-side RAKE") {
    val got = Search.rakeKeywords(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val stop = Set("the", "a")
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrase instances: maximal stopword-free runs
    val instances = docs.flatMap { case (id, text) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      for (w <- text.split(" ")) {
        if (stop(w)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs.map(ws => (id, ws))
    }
    val deg = instances.flatMap { case (_, ws) => ws.map(_ -> ws.length.toLong) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val scored = instances.map { case (_, ws) =>
      (ws.mkString(" "), ws.length.toLong, ws.map(deg).sum) }
    val expected = scored.groupBy(_._1).map { case (p, xs) =>
      (p, xs.length.toLong, xs.head._2, xs.head._3) }
      .toSeq.sortBy { case (p, n, _, s) => (-s, -n, p) }.take(20)
    assert(got.toSeq == expected, "RAKE top-20 must match the literal scorer")
  }
}
