package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-3 operators
  * (X167–X173) — each entry checked against an independent in-JVM
  * recomputation or an invariant its SQL twin can't state.
  */
class Round8cOpsSpec extends SparkSpec {

  test("ewma equals an in-JVM recomputation over the daily counts") {
    val daily = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day_num"))
      .groupBy("event_type", "day_num").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val got = Events.ewma(spark, sf001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (t, d) = (r.getString(0), r.getLong(1))
      var num = 0L; var den = 0L
      for (j <- (d - 19) to d; n <- daily.get((t, j))) {
        val w = 1L << (19 - (d - j)).toInt
        num += n * w; den += w
      }
      val expect = math.rint(num.toDouble / den * 1e6) / 1e6
      assert(r.getAs[Double]("ewma") == expect, s"ewma mismatch at ($t,$d)")
      assert(r.getAs[Long]("n_today") == daily((t, d)))
    }
  }

  test("markov steady state: uniform start, decimal rounds match in-JVM") {
    val rows = Events.markovSteady(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val types = rows.filter(_._1 == 0L).map(_._2).sorted
    assert(types.nonEmpty && rows.length == 5 * types.length)
    rows.filter(_._1 == 0L).foreach(r => assert(r._3 == 0.2))
    // in-JVM power iteration with the same 6dp-decimal discipline
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cnt = graft.tables.Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nt", lead(col("event_type"), 1).over(byTime))
      .filter(col("nt").isNotNull)
      .groupBy("event_type", "nt").agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val tot = cnt.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    def d6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val p = cnt.map { case ((f, t), n) =>
      ((f, t), d6(BigDecimal(n.toDouble / tot(f))))
    }.toMap
    var pi = types.map(t => t -> BigDecimal("0.2")).toMap
    for (r <- 1 to 4) {
      pi = types.map { j =>
        j -> d6(types.map(i =>
          pi(i) * p.getOrElse((i, j), BigDecimal(0))).sum)
      }.toMap
      rows.filter(_._1 == r.toLong).foreach { case (_, t, prob) =>
        assert(prob == pi(t).toDouble, s"round $r type $t")
      }
    }
  }

  test("components equal an in-JVM union-find over min-support-2 edges") {
    val li = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val expect = nodes.map(n => n -> find(n)).toMap
    // canonical label = min id per component (find roots at minimum)
    val byComp = expect.groupBy(_._2).view
      .mapValues(m => (m.keys.min, m.size.toLong)).toMap
    val got = Graphs.components(spark, sf001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (comp, size)) =>
      val (mn, sz) = byComp(expect(id))
      assert(comp == mn && size == sz, s"node $id: got ($comp,$size)")
    }
  }

  test("key candidates: o_orderkey is the only key; counts recompute") {
    val rows = DataQuality.keyCandidates(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet.size == 6)
    val o = graft.tables.Tables.orders(spark, sf001)
    val n = o.count()
    rows.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    assert(rows("o_orderkey").getAs[Boolean]("is_key"))
    assert(!rows("o_orderstatus").getAs[Boolean]("is_key"))
    val distinctCust = o.select("o_custkey").distinct().count()
    assert(rows("o_custkey").getAs[Long]("n_distinct") == distinctCust)
  }

  test("rule violations: counts equal direct filters, shared n_checked") {
    val rows = DataQuality.ruleViolations(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("R1", "R2", "R3", "R4", "R5", "R6"))
    val li = graft.tables.Tables.lineitem(spark, sf001)
    val o = graft.tables.Tables.orders(spark, sf001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val j = li.join(o, Seq("l_orderkey")).cache()
    try {
      val n = j.count()
      rows.values.foreach(r => assert(r.getAs[Long]("n_checked") == n))
      assert(rows("R1").getAs[Long]("n_violations") ==
        j.filter(col("l_shipdate") < col("o_orderdate")).count())
      assert(rows("R1").getAs[Long]("n_violations") > 0,
        "the generator artifact R1 exists to catch should fire")
      assert(rows("R3").getAs[Long]("n_violations") ==
        j.filter(col("l_quantity") > 45.0).count())
      assert(rows("R5").getAs[Long]("n_violations") == 0)
    } finally j.unpersist()
  }

  test("pcm vad equals an in-JVM recomputation from the synth frames") {
    val got = Multimodal.pcmVad(spark, sf001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 500)
    got.keys.foreach { d =>
      val nf = (2 + java.lang.Math.floorMod(d, 4)).toInt
      val energies = (0 until nf).map { f =>
        (0 until 160).map(j => math.abs(
          java.lang.Math.floorMod(d * 7 + (f * 160 + j).toLong * 13, 4096)
            - 2048)).sum.toLong
      }
      val tot = energies.sum
      val voiced = energies.map(_ * nf > tot)
      var segs = 0L; var run = 0L; var maxRun = 0L
      voiced.foreach { v =>
        if (v) { if (run == 0) segs += 1; run += 1; maxRun = maxRun.max(run) }
        else run = 0
      }
      assert(got(d) == ((nf.toLong, voiced.count(identity).toLong, segs,
        maxRun)), s"doc $d")
    }
  }

  test("abc/xyz grid conserves parts and revenue; classes recompute") {
    val grid = Analytics.abcXyz(spark, sf001).collect()
    val li = graft.tables.Tables.lineitem(spark, sf001)
    val nParts = li.select("l_partkey").distinct().count()
    assert(grid.map(_.getAs[Long]("n_parts")).sum == nParts)
    assert(grid.forall(r => Set("A", "B", "C")(r.getString(0)) &&
      Set("X", "Y", "Z")(r.getString(1))))
    // revenue conservation vs the direct factor-cast decimal sum
    val direct = li.select(
      sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))
        * 10000).cast("bigint")).as("t")).collect()(0).getLong(0)
    val gridRev = grid.map(r =>
      BigDecimal(r.getAs[Double]("revenue"))).sum
    assert((gridRev - BigDecimal(direct) / 10000).abs < BigDecimal("0.04"),
      s"revenue drifted: grid=$gridRev direct=${direct / 10000.0}")
    // A-class revenue share must be at least the 80% cut by construction
    val total = grid.map(r => r.getAs[Double]("revenue")).sum
    val aRev = grid.filter(_.getString(0) == "A")
      .map(_.getAs[Double]("revenue")).sum
    assert(aRev >= 0.8 * total - 0.01, s"A share ${aRev / total}")
  }
}
