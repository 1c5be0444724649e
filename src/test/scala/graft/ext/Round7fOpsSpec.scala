package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the sixth round-7 batch: CUSUM against a literal partial-sum
  * scan, the power curve against collected day-sets, assortativity
  * against exact BigInt moments, and the entropy profile against a
  * direct (ordered) recomputation.
  */
class Round7fOpsSpec extends SparkSpec {

  test("cusum: argmax of literal integer partial sums") {
    val got = Events.changepointCusum(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((t, (nDays, total, cpDay, sCp)) <- got) {
      val daily = ev.filter(_._1 == t).groupBy(_._2).toSeq
        .map { case (d, xs) => (d, xs.length.toLong) }.sortBy(_._1)
      assert(nDays == daily.length && total == daily.map(_._2).sum)
      var cum = 0L
      val ss = daily.zipWithIndex.map { case ((d, x), i) =>
        cum += x
        (d, cum * nDays - (i + 1) * total)
      }
      val best = ss.minBy { case (d, s) => (-math.abs(s), d) }
      assert((cpDay, sCp) == best, t)
    }
    assert(got.nonEmpty)
  }

  test("power curve: equals collected per-user day counts") {
    val got = Events.powerCurve(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ev = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val byUser = ev.groupBy(_._1).map { case (_, xs) => xs.length.toLong }
    val hist = byUser.groupBy(identity).map { case (d, xs) =>
      (d, xs.size.toLong) }.toSeq.sortBy(_._1)
    val total = hist.map(_._2).sum
    var cum = 0L
    val expected = hist.map { case (d, n) =>
      cum += n
      (d, n, cum, BigDecimal(cum.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.toSeq == expected)
    assert(got.last._4 == 1.0)
  }

  test("assortativity: equals exact BigInt moments") {
    val row = Graphs.assortativity(spark, sf001).collect().head
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val xy = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = BigInt(xy.length)
    val sx = xy.map(p => BigInt(p._1)).sum
    val sy = xy.map(p => BigInt(p._2)).sum
    val sxy = xy.map(p => BigInt(p._1) * BigInt(p._2)).sum
    val sxx = xy.map(p => BigInt(p._1) * BigInt(p._1)).sum
    val syy = xy.map(p => BigInt(p._2) * BigInt(p._2)).sum
    val r = BigDecimal((n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
       math.sqrt((n * syy - sy * sy).toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) == edges.length)
    assert(row.getDouble(1) == r)
  }

  test("entropy: matches a literal ordered count-of-counts sum") {
    val got = DataQuality.entropyProfile(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // brute-force one representative column per table
    def check(tbl: String, colName: String, vals: Seq[String]): Unit = {
      val (n, nd, h) = got((tbl, colName))
      assert(n == vals.length)
      val counts = vals.groupBy(identity).map(_._2.size.toLong)
      assert(nd == counts.size)
      val coc = counts.groupBy(identity).map { case (c, xs) =>
        (c, xs.size.toLong) }.toSeq.sortBy(_._1)
      var s = 0.0
      for ((c, m) <- coc) s += (m.toDouble * c) * math.log(c.toDouble)
      val expH = BigDecimal(math.log(n.toDouble) - s / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(h == expH, s"$tbl.$colName")
    }
    check("documents", "lang",
      graft.tables.Tables.documents(spark, sf001).select("lang")
        .collect().map(_.getString(0)))
    check("events", "user_id",
      graft.tables.Tables.events(spark, sf001).select("user_id")
        .collect().map(_.getLong(0).toString))
    check("orders", "o_orderstatus",
      graft.tables.Tables.orders(spark, sf001).select("o_orderstatus")
        .collect().map(_.getString(0)))
    assert(got.size == 7)
  }
}
