package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-8 wave-7 operators
  * (X190–X194).
  */
class Round8gOpsSpec extends SparkSpec {

  test("channel stats replay the test-card raster moments exactly") {
    val meta = graft.tables.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = meta.map { case (d, nc) =>
      val w = (8 + java.lang.Math.floorMod(d, 9)).toInt
      val h = (8 + java.lang.Math.floorMod(nc, 9)).toInt
      val px = for (x <- 0 until w; y <- 0 until h)
        yield java.lang.Math.floorMod(d * 31 + x * 7 + y * 13, 256)
      val (n, s, s2) = (px.size.toLong, px.map(_.toLong).sum,
        px.map(v => v.toLong * v).sum)
      (d, n, s, s2, px.min.toLong, px.max.toLong,
        math.rint(s.toDouble / n * 1e6) / 1e6,
        math.rint(math.sqrt((n * s2 - s * s).toDouble) / n * 1e6) / 1e6)
    }.toSet
    val got = Multimodal.channelStatsQuery(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSet
    assert(got == expect)
  }

  test("pitch tracker equals an in-JVM autocorrelation argmax") {
    val got = Multimodal.pcmPitch(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val docs = got.keys.map(_._1).toSet
    docs.foreach { d =>
      val nFrames = (2 + java.lang.Math.floorMod(d, 4)).toInt
      val x = Array.tabulate(160 * nFrames)(i =>
        (java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048).toInt)
      (0 until nFrames).foreach { f =>
        val rs = (20 to 80).map { lag =>
          val r = (0 until 160 - lag)
            .map(j => x(f * 160 + j).toLong * x(f * 160 + j + lag)).sum
          (r, lag.toLong)
        }
        val best = rs.maxBy(t => (t._1, -t._2)) // max R, ties to SMALL lag
        assert(got((d, f.toLong)) == (best._2, best._1), s"doc $d frame $f")
        assert(best._2 >= 20L && best._2 <= 80L)
      }
    }
  }

  test("peak detection equals a brute-force neighbourhood scan") {
    val daily = graft.tables.Tables.events(spark, sf001)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .groupBy("event_type", "d").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).flatMap { case (t, g) =>
      val s = g.sortBy(_._2)
      val n = s.length
      val total = s.map(_._3).sum
      s.indices.flatMap { i =>
        val prev = s.slice(math.max(0, i - 3), i).map(_._3)
        val next = s.slice(i + 1, math.min(n, i + 4)).map(_._3)
        val (p3, n3) = (if (prev.isEmpty) 0L else prev.max,
          if (next.isEmpty) 0L else next.max)
        val c = s(i)._3
        if (c > p3 && c > n3 && c * n > total)
          Some((t, s(i)._2, c, p3, n3))
        else None
      }
    }.toSet
    val got = Events.peakDetection(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
  }

  test("lsh calibration replays the S-curve over the observed histogram") {
    val hist = TextDedup.jaccardPairs(spark, sf001, 0.2)
      .select(round(col("jaccard"), 2).as("s")).groupBy("s")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    def pc(s: Double, b: Int, r: Int): Double = {
      // identical repeated-squaring chains as the impl/oracle
      val s2 = s * s; val s4 = s2 * s2; val s8 = s4 * s4; val s16 = s8 * s8
      val u = r match { case 2 => s2; case 4 => s4; case 8 => s8; case _ => s16 }
      val v = 1.0 - u
      val v2 = v * v; val v4 = v2 * v2; val v8 = v4 * v4
      val v16 = v8 * v8; val v32 = v16 * v16
      1.0 - (b match { case 4 => v4; case 8 => v8; case 16 => v16; case _ => v32 })
    }
    def q6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // replay the EXACT full-histogram form (sampleMod = 1): the shipped
    // entry's r9 sampled default (sampleMod = 2) matches this only in
    // expectation — Round9OpsSpec pins the sampled↔full agreement law.
    val got = TextDedup.lshCalibration(spark, sf001, sampleMod = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.size == 4)
    Seq((4, 16), (8, 8), (16, 4), (32, 2)).foreach { case (b, r) =>
      val high = hist.filter(_._1 >= 0.6)
      val low = hist.filter(_._1 < 0.6)
      val eh = high.map { case (s, n) => q6(n * pc(s, b, r)) }.sum.toDouble
      val el = low.map { case (s, n) => q6(n * pc(s, b, r)) }.sum.toDouble
      val (nh, nl, gh, gl) = got((b.toLong, r.toLong))
      assert(nh == high.map(_._2).sum && nl == low.map(_._2).sum, s"($b,$r)")
      assert(gh == eh && gl == el, s"($b,$r): $gh vs $eh / $gl vs $el")
    }
    // more bands (smaller r) => a uniformly higher S-curve => both
    // expected-candidate masses are monotone in b along the b*r=64 ridge
    val byB = Seq(4L, 8L, 16L, 32L).map(b =>
      got.find(_._1._1 == b).get._2)
    assert(byB.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      "exp_true must rise with bands")
    assert(byB.map(_._4).sliding(2).forall(p => p(0) <= p(1)),
      "exp_false must rise with bands")
  }

  test("full-sync merge audit reconstructs the desired snapshot exactly") {
    val desired = Warehouse.desiredCustomers(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).doubleValue)).toSet
    val out = Warehouse.mergeFullSync(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    // the audit's surviving rows ARE the desired state — the defining
    // property of a full-sync MERGE
    val surviving = out.filter(_._4 != "deleted")
      .map(t => (t._1, t._2, t._3)).toSet
    assert(surviving == desired)
    // action accounting from the residue derivations
    val baseKeys = graft.tables.Tables.customer(spark, sf001)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val counts = out.groupBy(_._4).map { case (a, g) => a -> g.size.toLong }
    assert(counts("deleted") == baseKeys.count(_ % 3 == 0).toLong)
    assert(counts("inserted") == baseKeys.count(_ % 13 == 2).toLong)
    assert(counts("updated") ==
      baseKeys.count(k => k % 3 != 0 && k % 4 == 0).toLong)
    assert(counts("unchanged") ==
      baseKeys.count(k => k % 3 != 0 && k % 4 != 0).toLong)
  }
}
