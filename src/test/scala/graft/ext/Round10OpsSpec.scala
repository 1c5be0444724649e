package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-side brute-force laws for the round-10 operators (X240–X251):
  * each new entry is recomputed independently in plain JVM code from the
  * collected fixture — the same discipline as Round8/9OpsSpec, so a bug
  * that the DuckDB twin happens to share (same wrong SQL both sides)
  * still fails here.
  */
class Round10OpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Array[String] =
    text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)

  private def rnd6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("good-turing table equals the brute-force freq-of-freq") {
    val texts = graft.tables.Tables.documents(spark, sf001)
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap { t =>
      val ws = toks(t)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSeq
      else Seq.empty
    }.groupBy(identity).map(_._2.length)
    val ff = counts.groupBy(identity).map { case (r, g) => (r.toLong, g.size.toLong) }
    val n = counts.map(_.toLong).sum
    val rows = LangModel.goodTuring(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 11)
    rows.foreach { case (r, nR, nNext, gt, raw, gtm) =>
      assert(nR == ff.getOrElse(r, 0L))
      assert(nNext == ff.getOrElse(r + 1, 0L))
      if (nR > 0) assert(gt.contains(rnd6((r + 1).toDouble * nNext / nR)))
      else assert(gt.isEmpty)
      assert(raw == rnd6(r.toDouble * nR / n))
      assert(gtm == rnd6((r + 1).toDouble * nNext / n))
    }
    // the r = 0 row's reassigned mass IS the unseen mass N1/N — and the
    // trigram stream genuinely has a tail, so it is positive
    val unseen = rows.find(_._1 == 0L).get._6
    assert(unseen == rnd6(ff.getOrElse(1L, 0L).toDouble / n) && unseen > 0)
    assert(rows.count(_._2 > 0) >= 3)
  }

  test("vocab richness equals brute-force Chao1/coverage/Simpson") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def stats(tokens: Seq[String]): (Long, Long, Long, Long, Long) = {
      val c = tokens.groupBy(identity).map(_._2.length.toLong)
      (tokens.length.toLong, c.size.toLong,
        c.count(_ == 1L).toLong, c.count(_ == 2L).toLong,
        c.map(x => x * (x - 1)).sum)
    }
    val expected = (docs.groupBy(_._1).map { case (s, g) =>
      s -> stats(g.flatMap(d => toks(d._2)).toSeq)
    } + ("ALL" -> stats(docs.flatMap(d => toks(d._2)).toSeq)))
    val rows = LangModel.vocabRichness(spark, sf001).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, v, f1, f2, rep2) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n, v, f1, f2)))
      assert(r.getDouble(5) == rnd6(v + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))))
      assert(r.getDouble(6) == rnd6(1.0 - f1.toDouble / n))
      assert(r.getDouble(7) == rnd6(v.toDouble / n))
      assert(r.getDouble(8) == rnd6(1.0 - rep2.toDouble / (n.toDouble * (n - 1))))
    }
  }

  test("k-fold balance equals the in-JVM fold replay") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val folded = docs.map { case (id, src, nc) =>
      (java.lang.Long.parseLong(md5hex(id.toString).take(4), 16) % 5, src, nc)
    }
    val n = docs.length.toLong
    val srcShare = folded.groupBy(_._2).map { case (s, g) =>
      s -> rnd6(g.length.toDouble / n) }
    val rows = TextStats.kfoldBalance(spark, sf001).collect()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      val f = r.getLong(0)
      val g = folded.filter(_._1 == f)
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_._3).sum)
      assert(r.getDouble(3) == rnd6(g.length.toDouble / n))
      val dev = g.groupBy(_._2).map { case (s, gg) =>
        math.abs(rnd6(gg.length.toDouble / g.length) - srcShare(s)) }.max
      assert(math.abs(r.getDouble(4) - dev) < 1e-9)
    }
  }

  test("quality calibration bins are coherent and ECE-consistent") {
    val rows = TextStats.qualityCalibration(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    // bin means live inside their decile; gap restates |conf - acc|
    rows.foreach { case (bin, _, avgScore, goodRate, gap, _) =>
      assert(bin >= 0 && bin <= 9)
      assert(avgScore >= bin / 10.0 - 1e-9 && avgScore <= (bin + 1) / 10.0 + 1e-9)
      assert(goodRate >= 0.0 && goodRate <= 1.0)
      assert(math.abs(gap - math.abs(avgScore - goodRate)) < 1e-9)
    }
    // the ece column equals the n-weighted gap mean of the output itself
    val ece = rnd6(rows.map(r => r._5 * r._2).sum / n)
    rows.foreach(r => assert(math.abs(r._6 - ece) < 1e-9))
    // roughly half the scored docs sit at/below the median-bits cut
    val good = rows.map(r => r._4 * r._2).sum
    assert(good >= n * 0.5 - 1 && good <= n * 0.75)
  }

  test("blocking quality equals the brute-force block arithmetic") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val blkOf = docs.map { case (id, t) =>
      id -> t.split(" ").take(5).mkString(" ") }.toMap
    val nb = blkOf.values.groupBy(identity).map(_._2.size.toLong)
    val cand = nb.map(b => b * (b - 1) / 2).sum
    val nDocs = docs.length.toLong
    val pairs = TextDedup.jaccardPairs(spark, sf001)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inBlock = pairs.count { case (a, b) => blkOf(a) == blkOf(b) }.toLong
    val row = DataQuality.blockingQuality(spark, sf001).collect().head
    assert(row.getLong(0) == nDocs)
    assert(row.getLong(1) == nb.size.toLong)
    assert(row.getLong(2) == cand)
    assert(row.getLong(3) == nDocs * (nDocs - 1) / 2)
    assert(row.getDouble(4) ==
      rnd6(1.0 - cand.toDouble / (nDocs * (nDocs - 1) / 2)))
    assert(row.getLong(5) == pairs.length.toLong)
    assert(row.getLong(6) == inBlock)
    assert(row.getDouble(7) == rnd6(inBlock.toDouble / pairs.length))
    // the audit is non-degenerate on the fixture: blocking prunes almost
    // everything yet keeps a nonzero share of the verified pairs
    assert(row.getDouble(4) > 0.9 && inBlock > 0)
  }

  test("theil decomposition: T ~= between + sum of within contributions") {
    // share/theil/decomp are DECIMAL(9,6) since r12 (rendering made
    // engine/libm-independent — the r11 driver-red fix)
    val rows = Analytics.theilRevenueDecimal(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue(), r.getDecimal(3).doubleValue(),
        r.getDecimal(4).doubleValue(), r.getDecimal(5).doubleValue()))
    val (totalRows, groups) = rows.partition(_._1 == "TOTAL")
    assert(totalRows.length == 1 && groups.nonEmpty)
    val t = totalRows.head
    // shares sum to 1 (up to per-group rounding)
    assert(math.abs(groups.map(_._4).sum - 1.0) < 1e-3)
    assert(t._2 == groups.map(_._2).sum)
    // additive law: T ≈ T_between + Σ s_g·T_g (terms 6dp-rounded)
    assert(math.abs(t._5 - (t._6 + groups.map(_._6).sum)) < 1e-3,
      s"T=${t._5} between=${t._6} within=${groups.map(_._6).sum}")
    // Theil is non-negative and the fixture is not perfectly equal
    assert(t._5 > 0 && t._6 >= 0)
  }

  test("hyperball estimates equal the exact-BFS register brute force") {
    val edges = graft.tables.Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).values.toSeq
      .flatMap { g =>
        val pks = g.map(_._2)
        for (a <- pks; b <- pks if a < b) yield (a, b)
      }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = adj.keySet.toSeq.sorted
    def regs(ball: Set[Long]): Array[Int] = {
      val a = new Array[Int](256)
      ball.foreach { id =>
        val h = java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
        val b = (h % 256).toInt
        val w = h / 256
        val rho = if (w == 0) 25 else 25 - java.lang.Long.toBinaryString(w).length
        if (rho > a(b)) a(b) = rho
      }
      a
    }
    def estOf(a: Array[Int]): Double = {
      val s = a.map(r => math.pow(2.0, -r)).sum
      val v = a.count(_ == 0)
      val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
      val raw = alpha * 65536.0 / s
      rnd6(if (raw <= 640.0 && v > 0) 256.0 * math.log(256.0 / v) else raw)
    }
    val got = Graphs.hyperBall(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(got.size == nodes.size)
    nodes.foreach { v =>
      val b0 = Set(v)
      val b1 = b0 ++ adj(v)
      val b2 = b1 ++ b1.flatMap(adj)
      val (e0, e1, e2) = (estOf(regs(b0)), estOf(regs(b1)), estOf(regs(b2)))
      val harm = ((math.round(e1 * 1e6) - math.round(e0 * 1e6)) * 2 +
        (math.round(e2 * 1e6) - math.round(e1 * 1e6))).toDouble / 2000000.0
      assert(got(v) == ((e0, e1, e2, harm)), s"node $v: ${got(v)}")
    }
  }

  test("tile dups equal the test-card arithmetic brute force") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tiles = docs.flatMap { case (d, nc) =>
      val w = (8 + java.lang.Math.floorMod(d, 9)).toInt
      val h = (8 + java.lang.Math.floorMod(nc, 9)).toInt
      val bufs = Array.fill(4, 4)(new StringBuilder)
      for (y <- 0 until h; x <- 0 until w) {
        val sb = bufs(x * 4 / w)(y * 4 / h)
        if (sb.nonEmpty) sb.append(',')
        sb.append(java.lang.Math.floorMod(d * 31 + x * 7 + y * 13, 256))
      }
      for (tx <- 0 until 4; ty <- 0 until 4)
        yield (md5hex(bufs(tx)(ty).toString), d)
    }
    val expected = tiles.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
      .map { case (sig, g) =>
        sig -> (g.length.toLong, g.map(_._2).distinct.size.toLong,
          g.map(_._2).min, g.map(_._2).max) }
    val rows = Multimodal.tileDups(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.size == expected.size && rows.nonEmpty)
    expected.foreach { case (sig, e) => assert(rows(sig) == e, sig) }
  }

  test("queue wait equals the sequential Lindley simulation") {
    val evs = graft.tables.Tables.events(spark, sf001)
      .selectExpr("event_type", "event_id", "unix_micros(ts) div 1000 as ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = evs.groupBy(_._1).map { case (t, g) =>
      val sorted = g.sortBy(e => (e._3, e._2))
      var w = 0L
      var prevT = 0L
      var prevS = 0L
      var first = true
      val waits = sorted.map { case (_, id, ms) =>
        val svc = 400000L + java.lang.Math.floorMod(id, 1000000L)
        if (!first) w = math.max(0L, w + prevS - (ms - prevT))
        first = false; prevT = ms; prevS = svc
        w
      }
      val span = sorted.map(_._3).max - sorted.map(_._3).min
      val busy = sorted.map(e =>
        400000L + java.lang.Math.floorMod(e._2, 1000000L)).sum
      (t, (sorted.length.toLong, waits.count(_ > 0L).toLong, waits.max,
        rnd6(waits.sum.toDouble / sorted.length),
        rnd6(waits.count(_ > 0L).toDouble / sorted.length),
        rnd6(busy.toDouble / (span + 1))))
    }
    val rows = Events.queueWait(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(rows.size == expected.size)
    expected.foreach { case (t, e) => assert(rows(t) == e, t) }
    // the arrival process genuinely queues somewhere on the fixture
    assert(rows.values.exists(_._2 > 0))
  }

  test("interval union equals the sequential merge simulation") {
    val evs = graft.tables.Tables.events(spark, sf001)
      .filter(col("event_type") === "error")
      .selectExpr("cast(ts as date) as day", "event_id",
        "unix_micros(ts) div 1000 as ms",
        "unix_micros(cast(cast(ts as date) as timestamp)) div 1000 as day0")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).map { case (day, g) =>
      val sorted = g.sortBy(e => (e._3, e._2))
      val dayEnd = g.head._4 + 86400000L
      var covered = 0L
      sorted.zipWithIndex.foreach { case ((_, _, ms, _), i) =>
        val next = if (i + 1 < sorted.length) sorted(i + 1)._3 else Long.MaxValue
        covered += math.min(3600000L, math.min(next - ms, dayEnd - ms))
      }
      day -> (g.length.toLong, covered, rnd6(1.0 - covered / 86400000.0))
    }
    val rows = Events.intervalUnion(spark, sf001).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(rows.size == expected.size && rows.nonEmpty)
    expected.foreach { case (d, e) => assert(rows(d) == e, d) }
    // overlap really occurs: union length < naive hold * count somewhere
    assert(expected.exists { case (_, (n, cov, _)) => cov < n * 3600000L })
  }

  test("ppr with an explicit seed list reproduces the default pick") {
    // r9 self-assessment #3: seeds are now a library parameter; passing
    // the default's own min-id set must be value-identical, and a
    // different seed set must actually move mass
    val default = Graphs.personalizedPagerank(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val seedSet = graft.tables.Tables.lineitem(spark, sf001)
      .select(col("l_orderkey").as("ok"))
      .join(graft.tables.Tables.orders(spark, sf001)
        .selectExpr("o_orderkey as ok", "o_custkey"), Seq("ok"))
      .select("o_custkey").distinct().collect().map(_.getLong(0))
      .sorted.take(5).toSeq
    val explicit = Graphs.personalizedPagerank(spark, sf001,
        seedIds = Some(seedSet)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(explicit == default)
    val other = Graphs.personalizedPagerank(spark, sf001,
        seedIds = Some(seedSet.drop(1)))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(other.nonEmpty && other != default)
  }

  test("rank fusion equals the in-JVM RRF of the two collected retrievers") {
    val ex = Similarity.cosineTopK(spark, sf001, 0L, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val sq = Similarity.scalarQuantTopK(spark, sf001, 0L, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, d) => (-d, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fused = (ex.keySet ++ sq.keySet).toSeq.map { id =>
      val s = ex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        sq.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
      .map { case (id, s) => (id, ex.get(id), sq.get(id), rnd6(s)) }
    val rows = Similarity.rankFusion(spark, sf001).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(rows.length == 10)
    assert(rows.toSeq == fused.toSeq)
    // fusion is non-trivial on the fixture: the two retrievers disagree
    // somewhere inside the fused cut
    assert(rows.exists(r => r._2 != r._3))
  }

  test("rfm migration equals the per-half brute-force scoring") {
    val orders = graft.tables.Tables.orders(spark, sf001)
      .selectExpr("o_custkey",
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 as day",
        "cast(o_totalprice as decimal(18,2)) as m",
        "o_orderdate < timestamp '1996-01-01' as h1")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getBoolean(3)))
    def seg(g: Seq[(Long, Long, java.math.BigDecimal)]): Map[Long, String] = {
      if (g.isEmpty) return Map.empty
      val perCust = g.groupBy(_._1).map { case (ck, rows) =>
        (ck, rows.map(_._2).max, rows.length.toLong,
          rows.map(r => BigDecimal(r._3)).sum)
      }.toSeq
      val maxDay = perCust.map(_._2).max
      perCust.map { case (ck, last, freq, mon) =>
        val rec = maxDay - last
        val r = if (rec <= 365) 3 else if (rec <= 730) 2 else 1
        val f = if (freq >= 12) 3 else if (freq >= 6) 2 else 1
        val m = if (mon >= 2000000) 3 else if (mon >= 1000000) 2 else 1
        val s =
          if (r == 3 && f + m >= 5) "champion"
          else if (r == 3) "recent"
          else if (r == 2 && f + m >= 5) "loyal"
          else if (r == 2) "warm"
          else if (f + m >= 5) "at_risk"
          else "hibernating"
        ck -> s
      }.toMap
    }
    val s1 = seg(orders.filter(_._4).map(o => (o._1, o._2, o._3)).toSeq)
    val s2 = seg(orders.filterNot(_._4).map(o => (o._1, o._2, o._3)).toSeq)
    val expected = (s1.keySet ++ s2.keySet).toSeq
      .map(ck => (s1.getOrElse(ck, "absent"), s2.getOrElse(ck, "absent")))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val rows = Analytics.rfmMigration(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(rows.map(_._2._1).sum == (s1.keySet ++ s2.keySet).size.toLong)
    val got = rows.map { case (k, v) => k -> v._1 }.toMap
    assert(got == expected)
    // per-from row shares sum to ~1
    rows.groupBy(_._1._1).foreach { case (_, g) =>
      assert(math.abs(g.map(_._2._2).sum - 1.0) < 1e-3)
    }
  }

  test("bipartite projection equals the capped brute force") {
    val cs = graft.tables.Tables.lineitem(spark, sf001)
      .selectExpr("l_orderkey as ok", "l_suppkey as sk")
      .join(graft.tables.Tables.orders(spark, sf001)
        .selectExpr("o_orderkey as ok", "o_custkey as ck"), Seq("ok"))
      .select("ck", "sk").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val capped = cs.groupBy(_._1).toSeq.flatMap { case (ck, g) =>
      g.map(_._2).sortBy(sk => (md5hex(s"$ck|$sk"), sk)).take(32)
        .map(sk => (ck, sk))
    }
    val deg = capped.groupBy(_._2).map { case (sk, g) => sk -> g.size.toLong }
    val pairs = capped.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sks = g.map(_._2).sorted
      for (i <- sks.indices; j <- i + 1 until sks.length)
        yield (sks(i), sks(j))
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      .filter(_._2 >= 2L)
    val rows = Graphs.bipartiteProject(spark, sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    assert(rows.length == pairs.size && rows.nonEmpty)
    rows.foreach { case ((s1, s2), (common, d1, d2, w)) =>
      assert(common == pairs((s1, s2)))
      assert(d1 == deg(s1) && d2 == deg(s2))
      assert(w == rnd6(common.toDouble / math.sqrt(d1.toDouble * d2)))
    }
  }

  test("ssim sums equal the arithmetic brute force and bound to (0, 1]") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (d, nc) =>
      val w = (8 + java.lang.Math.floorMod(d, 9)).toInt
      val h = (8 + java.lang.Math.floorMod(nc, 9)).toInt
      val px = Array.tabulate(w, h)((x, y) =>
        java.lang.Math.floorMod(d * 31 + x * 7 + y * 13, 256))
      val down = Array.tabulate((w + 1) / 2, (h + 1) / 2) { (bx, by) =>
        val xs = (2 * bx) until math.min(2 * bx + 2, w)
        val ys = (2 * by) until math.min(2 * by + 2, h)
        val vals = for (x <- xs; y <- ys) yield px(x)(y).toLong
        vals.sum / vals.size
      }
      var (sx, sy, sxx, syy, sxy) = (0L, 0L, 0L, 0L, 0L)
      for (x <- 0 until w; y <- 0 until h) {
        val xv = px(x)(y).toLong; val yv = down(x / 2)(y / 2)
        sx += xv; sy += yv; sxx += xv * xv; syy += yv * yv; sxy += xv * yv
      }
      d -> (w.toLong * h, sx, sy, sxx, syy, sxy)
    }.toMap
    val rows = Multimodal.imageSsim(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)), r.getDouble(7)))
    assert(rows.length == expected.size)
    rows.foreach { case (d, (sums, ssim)) =>
      assert(sums == expected(d), s"doc $d")
      assert(ssim > 0.0 && ssim <= 1.0, s"doc $d ssim=$ssim")
    }
    // downsampling genuinely loses detail somewhere: not all SSIM = 1
    assert(rows.exists(_._2._2 < 0.999))
  }

  test("hll m-sweep equals the register brute force at every width") {
    val du = graft.tables.Tables.events(spark, sf001)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def estAt(users: Seq[Long], m: Int, alpha: Double): Double = {
      val rhoMax = 33 - (math.log(m.toDouble) / math.log(2.0)).round.toInt
      val regs = new Array[Int](m)
      users.foreach { u =>
        val h = java.lang.Long.parseLong(md5hex(u.toString).take(8), 16)
        val b = (h % m).toInt
        val w = h / m
        val rho = if (w == 0) rhoMax
          else rhoMax - java.lang.Long.toBinaryString(w).length
        if (rho > regs(b)) regs(b) = rho
      }
      val s = regs.map(r => math.pow(2.0, -r)).sum
      val v = regs.count(_ == 0)
      val raw = alpha * (m.toDouble * m) / s
      rnd6(if (raw <= 2.5 * m && v > 0) m.toDouble * math.log(m.toDouble / v)
      else raw)
    }
    val rows = Sketches.hllMSweep(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(4),
        r.getDouble(6))).toMap
    val byType = du.groupBy(_._1)
    assert(rows.size == byType.size)
    byType.foreach { case (t, g) =>
      val users = g.map(_._2).toSeq
      val (exact, e16, e64, e256) = rows(t)
      assert(exact == users.distinct.size.toLong)
      assert(e16 == estAt(users, 16, 0.673), s"$t m16")
      assert(e64 == estAt(users, 64, 0.709), s"$t m64")
      assert(e256 == estAt(users, 256, 0.7213 / (1.0 + 1.079 / 256.0)), s"$t m256")
    }
  }

  test("theta diff: a-not-b + intersection restates |A| across the family") {
    val diff = Analytics.thetaDiff(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    val inter = Analytics.kmvIntersect(spark, sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sizes = graft.tables.Tables.events(spark, sf001)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff.nonEmpty)
    diff.foreach { case ((t1, t2), (exactAnotb, below, theta, est)) =>
      val common = inter.getOrElse((t1, t2), inter.getOrElse((t2, t1), 0L))
      // exact law: |A\B| + |A∩B| = |A|
      assert(exactAnotb + common == sizes(t1), s"$t1 $t2")
      assert(est == rnd6(below * 4294967296.0 / theta))
      // the estimator lands in a sane band around the exact answer
      assert(est >= 0.0 && math.abs(est - exactAnotb) <=
        math.max(100.0, exactAnotb * 0.6), s"$t1\\$t2 est=$est exact=$exactAnotb")
    }
  }

  test("unimax waterfill: exact budget, caps honoured, near-uniform") {
    val rows = TextStats.unimaxAlloc(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val budget = rows.map(_._2).sum * 3 / 2
    assert(rows.map(_._4).sum == budget, "quota sums to the exact budget")
    rows.foreach { case (s, avail, cap, q, capped, epochs) =>
      assert(cap == avail * 4)
      assert(q <= cap, s"$s over capacity")
      assert(capped == (q == cap))
      assert(epochs == rnd6(q.toDouble / avail))
    }
    // uncapped quotas are level±1 (the waterfill uniformity property)
    val un = rows.filterNot(_._5).map(_._4)
    if (un.length > 1) assert(un.max - un.min <= 1)
    // brute-force the level independently
    val caps = rows.map(_._3).sorted
    val n = caps.length
    var k = 0
    var cum = 0L
    while (k < n && caps(k) * (n - k) + cum <= budget) { cum += caps(k); k += 1 }
    val level = if (n > k) (budget - cum) / (n - k) else 0L
    rows.filterNot(_._5).foreach(r => assert(r._4 == level || r._4 == level + 1))
  }

  test("pcm agc equals the synthesis brute force and genuinely clips") {
    val docs = graft.tables.Tables.documents(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.map { d =>
      val n = 160 * (2 + java.lang.Math.floorMod(d, 4)).toInt
      val vs = (0 until n).map(i =>
        java.lang.Math.floorMod(d * 7 + i.toLong * 13, 4096) - 2048)
      val sumSq = vs.map(v => v * v).sum
      val meanSq = sumSq / n
      val clips = vs.count(v => v * v * 2359296L > 4190209L * meanSq).toLong
      d -> (n.toLong, vs.map(math.abs).max, sumSq, meanSq,
        2359296L * 1000000L / meanSq, clips,
        rnd6(clips.toDouble / n))
    }.toMap
    val rows = Multimodal.pcmAgc(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(rows.length == expected.size)
    rows.foreach { case (d, got) => assert(got == expected(d), s"doc $d") }
    // the 3/4-scale target sits above the sawtooth's natural RMS, so
    // normalization genuinely clips the waveform peaks
    assert(rows.exists(_._2._6 > 0))
  }

  test("retention plan equals the date brute force with bounded tiers") {
    val days = graft.tables.Tables.events(spark, sf001)
      .selectExpr("cast(ts as date) as day").distinct().collect()
      .map(_.getDate(0).toLocalDate).sorted
    val wm = days.max
    val aged = days.map(d => d ->
      java.time.temporal.ChronoUnit.DAYS.between(d, wm))
    val weekly = aged.filter(a => a._2 / 7 >= 1 && a._2 / 7 <= 4)
      .groupBy(_._2 / 7).map(_._2.minBy(_._2)._1).toSet
    val monthly = aged.filter(_._2 < 365)
      .groupBy(a => (a._1.getYear, a._1.getMonthValue))
      .map(_._2.minBy(_._2)._1).toSet
    val expected = aged.map { case (d, age) =>
      d.toString -> (age,
        if (age < 7) "daily"
        else if (weekly(d)) "weekly"
        else if (monthly(d)) "monthly"
        else "drop")
    }.toMap
    val rows = Warehouse.retentionPlan(spark, sf001).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getString(2)))
    assert(rows.length == expected.size)
    rows.foreach { case (d, got) => assert(got == expected(d), d) }
    val reasons = rows.groupBy(_._2._2).map { case (k, g) => k -> g.size }
    assert(reasons.getOrElse("daily", 0) <= 7)
    assert(reasons.getOrElse("weekly", 0) <= 4)
    assert(reasons.getOrElse("monthly", 0) <= 12)
  }

  test("srm check equals the md5-parity brute force") {
    val du = graft.tables.Tables.events(spark, sf001)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = du.groupBy(_._1).map { case (t, g) =>
      val arms = g.map(u =>
        java.lang.Long.parseLong(md5hex(u._2.toString + "|srm_v1").take(4), 16) % 2)
      val (na, nb) = (arms.count(_ == 0L).toLong, arms.count(_ == 1L).toLong)
      val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
      t -> (na, nb, rnd6(chi2), chi2 > 3.841459)
    }
    val rows = Events.srmCheck(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    assert(rows.size == expected.size)
    expected.foreach { case (t, e) => assert(rows(t) == e, t) }
  }

  test("triplet audit equals the in-JVM cosine brute force") {
    val emb = graft.tables.Tables.embeddings(spark, sf001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }
        s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val withBk = emb.map { case (id, l, v) =>
      (id, l, v, java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 16)
    }
    val trips = for {
      (ia, la, va, bka) <- withBk
      (ip, lp, vp, bkp) <- withBk
      if la == lp && bka == bkp && ia < ip
      negs = withBk.filter(o => o._4 == bka && o._2 != la)
      if negs.nonEmpty
    } yield {
      val vn = negs.minBy(_._1)._3
      (la, cos(va, vp), cos(va, vn))
    }
    val expected = trips.groupBy(_._1).map { case (l, g) =>
      val viol = g.count(t => t._2 < t._3 + 0.1).toLong
      val gaps = g.map(t => BigDecimal(rnd6(t._2 - t._3))).sum
      l.toLong -> (g.length.toLong, viol,
        rnd6(viol.toDouble / g.length),
        rnd6(gaps.toDouble / g.length))
    }
    val rows = Similarity.tripletAudit(spark, sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toMap
    assert(rows.size == expected.size && rows.nonEmpty)
    expected.foreach { case (l, e) => assert(rows(l) == e, s"label $l") }
  }
}
