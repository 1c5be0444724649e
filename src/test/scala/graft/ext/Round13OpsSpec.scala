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
    val orig = Analytics.theilRevenueDecimal(spark, sf001).collect()
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
    val orig = Analytics.hierRollupDecimal(spark, sf001).collect()
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

  test("NN-Descent audit equals the brute 2-hop refinement and is monotone") {
    val vecs = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def rnd6(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0; var i = 0
      while (i < a.length) {
        dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1
      }
      rnd6(dab / (math.sqrt(daa) * math.sqrt(dbb)))
    }
    val vm = vecs.toMap
    // the two-table seed: occupancy-bounded bucket top-4 on sign dims
    // 1..bits (the shared graph) UNION the same on the next block,
    // symmetrized + self-loops
    val bits = Similarity.knnBuildBits(vecs.length.toLong)
    def tableEdges(offset: Int): Set[(Long, Long)] = {
      def bucket(v: Array[Double]): String =
        (offset until offset + bits)
          .map(i => if (v(i) >= 0) '1' else '0').mkString
      val byBucket = vecs.groupBy { case (_, v) => bucket(v) }
      val topM = vecs.flatMap { case (id, v) =>
        byBucket(bucket(v)).filter(_._1 != id)
          .map { case (jd, w) => (jd, cos(v, w)) }
          .sortBy { case (jd, c) => (-c, jd) }.take(8)
          .map { case (jd, _) => (id, jd) }
      }
      topM.toSet ++ topM.map(_.swap).toSet
    }
    val edges: Map[Long, Set[Long]] =
      (tableEdges(0) ++ tableEdges(bits) ++
        vecs.map(p => (p._1, p._1)).toSet)
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    def keep(cand: Map[Long, Set[Long]]): Map[Long, Seq[(Long, Double)]] =
      cand.map { case (i, js) =>
        i -> js.toSeq.map(j => (j, cos(vm(i), vm(j))))
          .sortBy { case (j, c) => (-c, j) }.take(8)
      }
    val b0 = keep(edges.map { case (i, js) => i -> (js - i) })
    val hop2 = edges.map { case (i, js) =>
      i -> (js.flatMap(edges.getOrElse(_, Set.empty[Long])) - i)
    }
    val b1 = keep(hop2)
    def mean(kept: Map[Long, Seq[(Long, Double)]]): Double = {
      val cs = kept.values.flatten.map { case (_, c) =>
        new java.math.BigDecimal(java.lang.Double.toString(c)).setScale(6)
      }
      rnd6(cs.foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue() /
        cs.size)
    }
    val changed = b1.count { case (i, kept) =>
      val old = b0.getOrElse(i, Seq.empty).map(_._1).toSet
      kept.exists(p => !old.contains(p._1))
    }
    val expect = Seq(
      (0L, b0.size.toLong, b0.values.map(_.size).sum.toLong, 0L, mean(b0)),
      (1L, b1.size.toLong, b1.values.map(_.size).sum.toLong,
        changed.toLong, mean(b1)))
    val got = Similarity.knnDescentAudit(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == expect,
      s"got=${got.toSeq.mkString(",")} expect=${expect.mkString(",")}")
    // the monotone-improvement law, stated per node RANK-WISE (r13
    // advice: the corpus mean is NOT a law — a node with a short
    // round-0 list can gain extra lower-cosine edges in round 1 and
    // dilute the mean while every list improved): round 1 selects per
    // node over a SUPERSET of round 0's neighbourhood (self-loops ⇒
    // 1-hop ⊆ 2-hop), so the k-th best kept neighbour can only get
    // closer, and no list shrinks
    b0.foreach { case (i, kept0) =>
      val kept1 = b1.getOrElse(i, Seq.empty)
      assert(kept1.size >= kept0.size, s"node $i list shrank")
      kept0.indices.foreach { r =>
        assert(kept1(r)._2 >= kept0(r)._2,
          s"node $i rank $r cosine dropped: ${kept1(r)._2} < ${kept0(r)._2}")
      }
    }
    // and the audit must show actual refinement work on the fixture
    assert(got(1)._4 > 0L, "no node changed its list — vacuous fixture")
  }

  test("singleton type probes emit exactly the declared literals and " +
    "types (r14 decomposition of the combined probe)") {
    import org.apache.spark.sql.types._
    // int64: the green control (certified three ways in r13)
    val i = DataQuality.probeInt64(spark)
    assert(i.schema.map(f => (f.name, f.dataType)) ==
      Seq(("probe_id", LongType), ("int64", LongType)))
    assert(i.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 42L), (2L, 0L), (3L, -7L), (4L, 9007199254740993L)))
    // dec96
    val d96 = DataQuality.probeDec96(spark)
    assert(d96.schema.map(f => (f.name, f.dataType)) ==
      Seq(("probe_id", LongType), ("dec96", DecimalType(9, 6))))
    assert(d96.collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toPlainString)).toSeq ==
      Seq((1L, "-0.123450"), (2L, "0.000000"),
        (3L, "0.999999"), (4L, "-0.100000")))
    // dec182: carries the 18-significant-digit float64-unrepresentable
    // value — the prime suspect from the r13 combined-probe red
    val d182 = DataQuality.probeDec182(spark)
    assert(d182.schema.map(f => (f.name, f.dataType)) ==
      Seq(("probe_id", LongType), ("dec182", DecimalType(18, 2))))
    assert(d182.collect()
      .map(r => (r.getLong(0), r.getDecimal(1).toPlainString)).toSeq ==
      Seq((1L, "1234567890123456.78"), (2L, "0.00"),
        (3L, "-9.99"), (4L, "100.10")))
    // double
    val f64 = DataQuality.probeDouble(spark)
    assert(f64.schema.map(f => (f.name, f.dataType)) ==
      Seq(("probe_id", LongType), ("float64", DoubleType)))
    assert(f64.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 0.1), (2L, -2.5), (3L, 123456.789012), (4L, 0.0000001)))
  }
}
