package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-13 bisection probes
  * (X288–X291): each probe is recomputed independently in plain JVM code
  * from the collected fixture (same discipline as Round8–12OpsSpec), and
  * each is additionally tied to its original entry by an exact or
  * bounded cross-entry law — the probes exist to vary ONE axis against
  * `analytics_theil` / `analytics_hier_rollup`, so the suite proves the
  * intended axis is the only difference.
  */
class Round13OpsSpec extends SparkSpec {

  private def microRound(x: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** The entry's own per-customer revenue relation (nation, ck, x) —
    * collected once; the laws below recompute everything downstream of
    * it in plain JVM code.
    */
  private lazy val revRows: Array[(String, Long, java.math.BigDecimal)] = {
    val nations = graft.tables.Tables.nation(spark, sf001)
      .select(col("n_nationkey"), col("n_name"))
    graft.tables.Tables.orders(spark, sf001)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      .join(graft.tables.Tables.customer(spark, sf001)
        .select(col("c_custkey").as("ck"), col("c_nationkey")), Seq("ck"))
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("ck"), col("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
  }

  test("theil micro probe equals the brute-force BIGINT rendering") {
    val byNation = revRows.groupBy(_._1).map { case (nat, g) =>
      nat -> (g.length.toLong,
        g.map(_._3).foldLeft(java.math.BigDecimal.ZERO)(_.add(_)))
    }
    val n = revRows.length.toLong
    val s = byNation.values.map(_._2)
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue()
    val expGroups = byNation.toSeq.map { case (nat, (ng, xgDec)) =>
      val xg = xgDec.doubleValue()
      val tgu = revRows.filter(_._1 == nat).map { case (_, _, xDec) =>
        val x = xDec.doubleValue()
        microRound((x / xg) * math.log(ng * x / xg) * 1000000.0)
      }.sum
      (nat, ng, xgDec.movePointRight(2).longValueExact(),
        microRound(xg / s * 1000000.0), tgu,
        microRound((xg / s) * tgu.toDouble))
    }
    val tu = revRows.map { case (_, _, xDec) =>
      val x = xDec.doubleValue()
      microRound((x / s) * math.log(n * x / s) * 1000000.0)
    }.sum
    val bu = byNation.toSeq.map { case (_, (ng, xgDec)) =>
      val xg = xgDec.doubleValue()
      microRound((xg / s) * math.log((xg / s) * (n.toDouble / ng)) *
        1000000.0)
    }.sum
    val sDec = byNation.values.map(_._2)
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val expect = (expGroups :+
      (("TOTAL", n, sDec.movePointRight(2).longValueExact(),
        1000000L, tu, bu))).sortBy(_._1)
    val got = Analytics.theilRevenueMicro(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expect,
      s"got=${got.toSeq.mkString(",")} expect=${expect.mkString(",")}")
    // additive decomposition survives the integer rendering: the TOTAL
    // theil equals between + Σ within-contributions up to the per-term
    // half-micro roundings (≤ n_customers + a small constant micros)
    val totalRow = got.find(_._1 == "TOTAL").get
    val sumDecomp = got.filter(_._1 != "TOTAL").map(_._6).sum
    assert(math.abs(totalRow._5 - (totalRow._6 + sumDecomp)) <= n + 100,
      s"additive law: T=${totalRow._5} vs Tb+Σ=${totalRow._6 + sumDecomp}")
  }

  test("theil micro probe is X245 re-rendered: same values ×10⁶/×100") {
    val micro = Analytics.theilRevenueMicro(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val orig = Analytics.theilRevenue(spark, sf001).collect()
    assert(orig.length == micro.size)
    orig.foreach { r =>
      val (nat, ng) = (r.getString(0), r.getLong(1))
      val (mg, mRev, mShare, mTheil, mDecomp) = micro(nat)
      assert(mg == ng, s"$nat n_customers")
      // revenue: EXACTLY the decimal in cents (both are x_g renderings)
      assert(mRev == r.getDecimal(2).movePointRight(2).longValueExact(),
        s"$nat revenue_cents vs revenue×100")
      // ratios: the micro rendering rounds each TERM at 10⁻⁶ like the
      // decimal does, so per-nation drift is bounded by one micro per
      // summed term (share/decomp are single-value roundings: ≤ 1)
      def m6(c: Int): Long = r.getDecimal(c).movePointRight(6).longValueExact()
      assert(math.abs(mShare - m6(3)) <= 1L, s"$nat share")
      assert(math.abs(mTheil - m6(4)) <= ng + 1, s"$nat theil")
      assert(math.abs(mDecomp - m6(5)) <= ng + 2, s"$nat decomp")
    }
  }

  test("hier rollup cents probe equals the brute-force integer walk " +
    "and X267 ×100") {
    val percust = graft.tables.Tables.orders(spark, sf001)
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getDecimal(1).movePointRight(2)
        .longValueExact()))
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    percust.foreach { case (ck, revC) =>
      var node = ck
      var done = false
      while (!done) {
        val (c, s) = acc.getOrElse(node, (0L, 0L))
        acc(node) = (c + 1, s + revC)
        if (node >= 10) node = node / 10 else done = true
      }
    }
    val got = Analytics.hierRollupCents(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == acc.size)
    got.foreach { case (node, (depth, nm, cents)) =>
      val (ec, es) = acc(node)
      assert(depth == node.toString.length.toLong)
      assert(nm == ec, s"node $node members")
      assert(cents == es, s"node $node cents $cents vs $es")
    }
    // cross-entry law: the probe IS X267 with the revenue column in
    // cents — node set, member counts, and 100×revenue match exactly
    val orig = Analytics.hierRollup(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDecimal(3).movePointRight(2).longValueExact()))
    assert(got.toSeq.sortBy(_._1) == orig.toSeq.sortBy(_._1))
  }

  test("hier rollup counts probe equals the structure of the cents probe") {
    val keys = graft.tables.Tables.orders(spark, sf001)
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0))
    val acc = scala.collection.mutable.Map.empty[Long, Long]
    keys.foreach { ck =>
      var node = ck
      var done = false
      while (!done) {
        acc(node) = acc.getOrElse(node, 0L) + 1
        if (node >= 10) node = node / 10 else done = true
      }
    }
    val got = Analytics.hierRollupCounts(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == acc.size)
    got.foreach { case (node, depth, nm) =>
      assert(depth == node.toString.length.toLong)
      assert(nm == acc(node), s"node $node members")
    }
    // structure law vs the cents probe: identical (node, n_members)
    val cents = Analytics.hierRollupCents(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == cents.toSeq)
  }

  test("type probe emits exactly the declared literals and types") {
    import org.apache.spark.sql.types._
    val df = DataQuality.probeTypes(spark)
    assert(df.schema.map(f => (f.name, f.dataType)) == Seq(
      ("probe_id", LongType), ("dec96", DecimalType(9, 6)),
      ("dec182", DecimalType(18, 2)), ("int64", LongType),
      ("float64", DoubleType)))
    val got = df.collect().map(r => (r.getLong(0),
      r.getDecimal(1).toPlainString, r.getDecimal(2).toPlainString,
      r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, "-0.123450", "1234567890123456.78", 42L, 0.1),
      (2L, "0.000000", "0.00", 0L, -2.5),
      (3L, "0.999999", "-9.99", -7L, 123456.789012),
      (4L, "-0.100000", "100.10", 9007199254740993L, 0.0000001)))
  }
}
